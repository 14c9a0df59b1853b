from .stage1 import Stage1Trainer, make_train_step  # noqa: F401
