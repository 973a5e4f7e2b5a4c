"""L4 state initialization: static IMU, ground-truth seed, IMU+wheel."""
