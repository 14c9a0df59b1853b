from .stage1 import Stage1Trainer, make_train_step  # noqa: F401
from .stage2 import Stage2Trainer  # noqa: F401
