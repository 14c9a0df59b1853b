from .occupancy import extract_occupancy_field, OccupancyTransform  # noqa: F401
from .marching_cubes import marching_cubes  # noqa: F401
