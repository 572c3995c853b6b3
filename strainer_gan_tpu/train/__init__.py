from .state import GANState, create_state  # noqa: F401
from .steps import StepConfig, make_train_step  # noqa: F401
from .schedules import clean_ratio_at, lr_at  # noqa: F401
