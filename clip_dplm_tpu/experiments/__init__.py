from clip_dplm_tpu.experiments.registry import build_model, build_data  # noqa: F401
