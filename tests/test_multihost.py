"""Two-process multi-host smoke test (CPU backend, gloo collectives).

Proves the ``jax.distributed`` code path exists and works: two OS
processes, 4 virtual CPU devices each, one process-spanning 8-device mesh,
and the full SHARDED pipeline step (volume-x GSPMD + shard_map+psum GN)
running across the process boundary — the structural equivalent of
BASELINE's ≥2-host configuration with DCN replaced by gloo/localhost.

The heavy lifting happens in subprocesses (scripts/multihost_worker.py)
because jax.distributed must be initialized before any backend use, which
cannot happen inside an already-initialized pytest process.
"""

import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_step():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    # workers set their own JAX_PLATFORMS/XLA_FLAGS; drop the 8-device
    # flag conftest put in OUR environment so each worker gets 4
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # NO compile cache for the workers: persistent-cache-served XLA-CPU
    # SPMD executables can abort at execution on this jax (see
    # tests/conftest.py), and gloo/multi-process entries must never leak
    # into other contexts' caches
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1100)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    assert any("MULTIHOST_OK" in o for o in outs), outs[0][-2000:]
