from bds3_tpu.acquire.pcps import AcqResults, acquire  # noqa: F401
