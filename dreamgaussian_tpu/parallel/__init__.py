from .dp import (  # noqa: F401
    make_data_mesh,
    make_dp_train_scan,
    make_dp_train_step,
)
