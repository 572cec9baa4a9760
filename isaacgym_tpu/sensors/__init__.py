from isaacgym_tpu.sensors.camera import Camera  # noqa: F401
