from tpu_restir.render.integrators.restir.pipeline import (  # noqa: F401
    RestirState, init_restir_state, restir_step)
