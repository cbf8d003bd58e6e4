from tpu_restir.render.integrators.naive import render_naive  # noqa: F401
from tpu_restir.render.integrators.nee import render_nee  # noqa: F401
