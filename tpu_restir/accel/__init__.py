from tpu_restir.accel.bvh import build_bvh2, build_clusters  # noqa: F401
