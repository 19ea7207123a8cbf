from bds3_tpu.pvt.geodesy import cart2geo, cart2utm, find_utm_zone, topocent  # noqa: F401
from bds3_tpu.pvt.lsq import least_square_pos  # noqa: F401
from bds3_tpu.pvt.satpos import satpos  # noqa: F401
from bds3_tpu.pvt.solver import NavSolutions, post_navigation  # noqa: F401
