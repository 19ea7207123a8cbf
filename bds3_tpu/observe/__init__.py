from bds3_tpu.observe.cn0 import cn0_pld_series, vsm_cn0  # noqa: F401
