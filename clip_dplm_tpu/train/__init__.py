from clip_dplm_tpu.train.state import TrainState, create_train_state, build_optimizer  # noqa: F401
from clip_dplm_tpu.train.trainer import Trainer, make_train_step, make_eval_step  # noqa: F401
from clip_dplm_tpu.train.preemption import PreemptionGuard  # noqa: F401
