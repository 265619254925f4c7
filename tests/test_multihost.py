"""Multi-host execution path: 2 real processes, cross-process collectives
(VERDICT r2 item 4 / SURVEY §2.4-§5 distributed backend).

Launches tests/multihost_worker.py twice (separate interpreters, 4 virtual
CPU devices each, jax.distributed over a local coordinator) and runs the
dp x ep shard_map gate bootstrap on the 8-device mesh spanning both: the
per-step ep psum crosses process boundaries through real (Gloo) collective
ops.  Each worker decrypt-verifies its host-local output rows and asserts
bit-identity with a single-process bootstrap.
"""

import pathlib
import socket
import subprocess
import sys

def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_bootstrap():
    root = pathlib.Path(__file__).parent
    port = str(_free_port())
    env = {"PYTHONPATH": str(root.parent)}
    import os
    env = {**os.environ, **env}
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(root / "multihost_worker.py"), str(r), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for r in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"
        assert f"[rank {r}] MULTIHOST OK" in out, out[-4000:]
