from pfd_tpu.diffusion import schedules  # noqa: F401
