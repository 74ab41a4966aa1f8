from opm_tpu.utils import units  # noqa: F401
