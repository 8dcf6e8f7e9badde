from clip_dplm_tpu.utils.precision import Policy, DTYPES  # noqa: F401
