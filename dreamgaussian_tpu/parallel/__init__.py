from .dp import make_data_mesh, make_dp_train_step  # noqa: F401
