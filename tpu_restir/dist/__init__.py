from tpu_restir.dist.mesh import make_mesh  # noqa: F401
