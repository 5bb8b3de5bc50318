from tsr_tpu.parallel import mesh  # noqa: F401
from tsr_tpu.parallel.mesh import make_mesh, shard_batch, shard_variables  # noqa: F401
