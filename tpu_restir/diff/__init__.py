from tpu_restir.diff.params import apply_params, extract_params  # noqa: F401
