from bds3_tpu.io.ifdata import IFDataFile, probe_stats  # noqa: F401
from bds3_tpu.io.synth import SatParams, synthesize_if  # noqa: F401
