"""Persistent TPU experiment worker: keeps the (slow-to-init) tunneled
backend alive and execs numbered command files as they appear.

Protocol: write /tmp/tpuw/cmd_N.py (N = 1, 2, ...); the worker execs it
in a shared namespace and writes stdout+traceback to /tmp/tpuw/out_N.log
then touches /tmp/tpuw/done_N. Exits if /tmp/tpuw/stop exists.
"""

import io
import os
import time
import traceback
import contextlib

DIR = "/tmp/tpuw"
os.makedirs(DIR, exist_ok=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

t0 = time.time()
float(jax.jit(lambda x: jnp.sum(x * 2))(jnp.ones((8, 128))))
with open(os.path.join(DIR, "ready"), "w") as f:
    f.write(f"warmup {time.time()-t0:.1f}s\n")

ns = {"jax": jax, "jnp": jnp}
n = 1
while not os.path.exists(os.path.join(DIR, "stop")):
    cmd = os.path.join(DIR, f"cmd_{n}.py")
    if os.path.exists(cmd):
        time.sleep(0.2)  # let the write finish
        buf = io.StringIO()
        try:
            with open(cmd) as f:
                code = f.read()
            with contextlib.redirect_stdout(buf):
                exec(compile(code, cmd, "exec"), ns)
        except SystemExit:
            pass
        except Exception:
            buf.write(traceback.format_exc())
        with open(os.path.join(DIR, f"out_{n}.log"), "w") as f:
            f.write(buf.getvalue())
        with open(os.path.join(DIR, f"done_{n}"), "w") as f:
            f.write("ok")
        n += 1
    else:
        time.sleep(0.5)
