"""Independent, deliberately-naive re-implementations of the MATLAB
reference algorithms' *semantics* for cross-validation.

These mirror the reference receivers' documented behavior (see SURVEY.md
section 2) using plain Python loops — a distinct code path from the
vectorized production code in bds3_tpu/, so agreement is meaningful.
"""
from __future__ import annotations


def jacobi_symbol(a: int, n: int) -> int:
    """Jacobi symbol (a/n) by quadratic reciprocity (n odd positive)."""
    a %= n
    result = 1
    while a != 0:
        while a % 2 == 0:
            a //= 2
            if n % 8 in (3, 5):
                result = -result
        a, n = n, a
        if a % 4 == 3 and n % 4 == 3:
            result = -result
        a %= n
    return result if n == 1 else 0


def slow_legendre_bits(n: int) -> list[int]:
    bits = [0] * n
    for i in range(1, n):
        bits[i] = 1 if jacobi_symbol(i, n) == 1 else 0
    return bits


def slow_weil(n: int, w: int, p: int, length: int) -> list[int]:
    """Bipolar Weil code via the MATLAB indexing (generateDataBOC11.m:76-82)."""
    leg = slow_legendre_bits(n)
    out = []
    for ind in range(length):
        k = (ind + p - 1) % n
        out.append(1 - 2 * (leg[k] ^ leg[(k + w) % n]))
    return out


def slow_b2a_code(seed_bits: list[int], g1_taps, g2_taps, length: int,
                  reset_index: int = 8190) -> list[int]:
    """Bipolar B2a ranging code via explicit register-list shifting
    (generateB2aDataCode.m:106-138 semantics; registers as bit lists,
    cell 1 first; output = xor of last cells)."""
    reg1 = [1] * 13
    reg2 = list(seed_bits)
    out = []
    for ind in range(1, length + 1):
        out.append(1 - 2 * (reg1[-1] ^ reg2[-1]))
        fb1 = 0
        for t in g1_taps:
            fb1 ^= reg1[t - 1]
        reg1 = [fb1] + reg1[:-1]
        fb2 = 0
        for t in g2_taps:
            fb2 ^= reg2[t - 1]
        reg2 = [fb2] + reg2[:-1]
        if ind == reset_index:
            reg1 = [1] * 13
    return out
