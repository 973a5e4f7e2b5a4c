"""L6 typed configuration tree."""

from .options import (  # noqa: F401
    CameraOptions,
    EstimatorOptions,
    GpsOptions,
    ImuOptions,
    InitOptions,
    Options,
    SystemOptions,
    WheelOptions,
)
