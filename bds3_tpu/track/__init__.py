from bds3_tpu.track.loops import dll_coefficients, pll_coefficients  # noqa: F401
from bds3_tpu.track.state import (  # noqa: F401
    ChannelInit,
    TrackConfig,
    make_track_config,
)
from bds3_tpu.track.driver import TrackResults, track  # noqa: F401
