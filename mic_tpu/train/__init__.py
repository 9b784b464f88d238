from mic_tpu.train.loss import label_smoothed_cross_entropy  # noqa: F401
from mic_tpu.train.schedule import linear_warmup_linear_decay  # noqa: F401
from mic_tpu.train.state import TrainState  # noqa: F401
from mic_tpu.train.steps import make_eval_step, make_train_step  # noqa: F401
