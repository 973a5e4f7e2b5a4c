"""L2 filter core: state layout, EKF primitives, IMU propagation, interpolation."""
