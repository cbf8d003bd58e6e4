from tpu_restir.io.export import export_image, save_png, write_sidecar  # noqa: F401
