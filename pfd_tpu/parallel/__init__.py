from pfd_tpu.parallel.mesh import make_mesh  # noqa: F401
from pfd_tpu.parallel.serve import DataParallelServer  # noqa: F401
from pfd_tpu.parallel.zoo_serve import ZooServer  # noqa: F401
