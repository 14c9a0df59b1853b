from .scheduler import DDIMScheduler  # noqa: F401
from .sds import sds_grad_loss  # noqa: F401
