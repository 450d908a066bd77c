"""True multi-process distributed execution (``jax.distributed``).

The reference is a single-process engine; its closest principle is running
the same binaries on the real foreign target under qemu
(`/root/reference/larq_compute_engine/tests/qemu_test.bzl:1-50`). The TPU
analogue: the same packed-inference program executed by N real OS processes
forming one global device mesh (``jax.distributed.initialize``; CPU backend
uses Gloo collectives so the flow is testable without a pod), asserting the
result is identical to single-process execution. On a TPU pod the same entry
point runs per host with the host's local chips.

``worker_main`` is the per-process entry (also exposed as
``python -m compute_engine_tpu.runtime.multiprocess``); ``launch_workers``
spawns a local N-process group of them for tests/CI.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

__all__ = ["initialize_worker", "worker_main", "launch_workers",
           "free_port"]


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def initialize_worker(coordinator: str, num_processes: int, process_id: int,
                      local_device_count: int | None = None):
    """Join the process group. Must run before any other JAX usage.

    On CPU (tests / this environment) ``local_device_count`` forces N
    virtual devices per process; on a TPU pod leave it None — the runtime
    discovers the host's chips.
    """
    import jax

    if local_device_count is not None:
        import re

        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       os.environ.get("XLA_FLAGS", ""))
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
            f"{local_device_count}").strip()
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax


def worker_main(argv=None):
    """Per-process entry: sharded packed inference over the global mesh.

    Loads a converted artifact, shards the (deterministic) global batch over
    the "data" mesh axis with this process contributing its local slice,
    runs the jitted forward with replicated output, and writes the result
    to ``--out`` for cross-process comparison.
    """
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--local-device-count", type=int, default=None)
    p.add_argument("--artifact", required=True)
    p.add_argument("--model", required=True,
                   help="zoo model name, or tiny:<filters>:<blocks>:<classes>"
                        ":<size> for a reduced QuickNet")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    jax = initialize_worker(args.coordinator, args.num_processes,
                            args.process_id, args.local_device_count)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..converter import load_artifact
    from ..models import packed_apply
    from ..models.zoo import get_model, tiny_quicknet

    if args.model.startswith("tiny:"):
        _, filters, blocks, classes, size = args.model.split(":")
        spec = tiny_quicknet(
            tuple(int(f) for f in filters.split(",")),
            tuple(int(b) for b in blocks.split(",")),
            num_classes=int(classes), input_size=int(size))
    else:
        spec = get_model(args.model)
    _, _, layers = load_artifact(args.artifact)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    # Deterministic global batch; every process generates the same array and
    # contributes its process-local slice.
    rng = np.random.default_rng(args.seed)
    x = rng.normal(0, 1, (args.batch, *spec.input_size, 3)).astype(
        np.float32)
    per = args.batch // args.num_processes
    x_local = x[args.process_id * per:(args.process_id + 1) * per]
    x_global = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), x_local)

    fn = jax.jit(
        lambda t: packed_apply(spec, layers, t,
                               compute_dtype=jnp.float32),
        in_shardings=NamedSharding(mesh, P("data")),
        out_shardings=NamedSharding(mesh, P()))
    out = np.asarray(fn(x_global))
    np.save(args.out, out)
    print(f"process {args.process_id}: wrote {out.shape} -> {args.out}",
          flush=True)


def launch_workers(num_processes: int, *, artifact: str, model: str,
                   out_dir: str, batch: int = 8, seed: int = 0,
                   local_device_count: int = 4, extra_env=None):
    """Spawn a local N-process group of ``worker_main``s.

    Returns (procs, out_paths); callers wait() and load the outputs.
    """
    coordinator = f"127.0.0.1:{free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # workers pick their own device count
    if extra_env:
        env.update(extra_env)
    procs, outs = [], []
    for pid in range(num_processes):
        out = os.path.join(out_dir, f"out_{pid}.npy")
        cmd = [sys.executable, "-m",
               "compute_engine_tpu.runtime.multiprocess",
               "--coordinator", coordinator,
               "--num-processes", str(num_processes),
               "--process-id", str(pid),
               "--local-device-count", str(local_device_count),
               "--artifact", artifact, "--model", model,
               "--batch", str(batch), "--seed", str(seed),
               "--out", out]
        procs.append(subprocess.Popen(cmd, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
        outs.append(out)
    return procs, outs


if __name__ == "__main__":
    worker_main()
