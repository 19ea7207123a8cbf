from bds3_tpu.utils.phase import carrier_table, phase_tables  # noqa: F401
