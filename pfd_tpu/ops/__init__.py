from pfd_tpu.ops import nn  # noqa: F401
