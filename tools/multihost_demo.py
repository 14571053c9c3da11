"""Multi-host (multi-process) linked-mode compression demo.

The TPU-native analog of scaling the reference CLI's MT engine past one
machine: N processes each own a shard of the block batch (their "host"
slice), `jax.distributed` + a global mesh runs linked_encode_step across
all of them — the 64 KB history rides process-to-process over the same
ppermute that carries it chip-to-chip inside a slice, and the ordered
frame assembly (size all-gather + prefix sum) spans the whole mesh, i.e.
DCN replaces the reference's single-process WriteRegister
(lz4io.c:465-635).

Run as coordinator+workers (CPU backend, 4 virtual devices/process):
    python tools/multihost_demo.py --spawn 2
Exit code 0 and "MULTIHOST OK" on success.
"""
from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEV_PER_PROC = 4
CAP_N = 16384
BLOCKS_PER_PROC = 4


def worker(pid: int, nprocs: int, port: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs, process_id=pid)
    import jax.numpy as jnp                     # noqa: F401
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from lz4_tpu.block.encode_jax import DICT_CAP
    from lz4_tpu.parallel.engine import linked_encode_step

    devices = np.array(jax.devices())           # global devices, all procs
    assert devices.size == nprocs * DEV_PER_PROC
    mesh = Mesh(devices, ("data",))

    from lz4_tpu.utils.datagen import gen_buffer
    B = nprocs * BLOCKS_PER_PROC
    # deterministic global corpus; each process materializes only its rows
    full = gen_buffer(B * CAP_N, match_prob=0.7, seed=9)
    glob = np.frombuffer(full, np.uint8).reshape(B, CAP_N)
    lo = pid * BLOCKS_PER_PROC
    local = glob[lo: lo + BLOCKS_PER_PROC].copy()
    lens_l = np.full(BLOCKS_PER_PROC, CAP_N, np.int32)

    shard = NamedSharding(mesh, P("data"))
    src = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data"))
    lens = multihost_utils.host_local_array_to_global_array(
        lens_l, mesh, P("data"))
    head = np.zeros((1, DICT_CAP), np.uint8)
    head_len = np.zeros(1, np.int32)
    head_g = multihost_utils.host_local_array_to_global_array(
        head, mesh, P())
    head_len_g = multihost_utils.host_local_array_to_global_array(
        head_len, mesh, P())

    comp, csizes, offsets, total = linked_encode_step(
        src, lens, head_g, head_len_g, cap_n=CAP_N, mesh=mesh)

    # every process gathers the full result over DCN, then verifies
    comp_all = multihost_utils.process_allgather(comp, tiled=True)
    csizes_all = multihost_utils.process_allgather(csizes, tiled=True)
    offsets_all = multihost_utils.process_allgather(offsets, tiled=True)
    total_v = int(np.asarray(
        multihost_utils.process_allgather(total, tiled=True)).reshape(-1)[0])

    assert comp_all.shape[0] == B and csizes_all.shape[0] == B
    assert total_v == int(csizes_all.sum()), (total_v, csizes_all.sum())
    # offsets must be the exclusive prefix sum (ordered frame assembly)
    expect = np.cumsum(csizes_all) - csizes_all
    assert (offsets_all == expect).all()

    if pid == 0:
        from lz4_tpu.block.ref_codec import decompress_block
        for i in range(B):
            prefix = glob[i - 1].tobytes() if i > 0 else None
            dec = decompress_block(
                comp_all[i, : csizes_all[i]].tobytes(), CAP_N,
                dict_prefix=prefix)
            assert dec == glob[i].tobytes(), f"linked block {i}"
        print(f"MULTIHOST OK: {nprocs} processes x {DEV_PER_PROC} devices, "
              f"{B}x{CAP_N}B linked -> {total_v}B, cross-process history "
              "carry + ordered assembly verified", flush=True)
    jax.distributed.shutdown()


def spawn(nprocs: int) -> int:
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count="
                          f"{DEV_PER_PROC}").strip()
    env.pop("JAX_PLATFORM_NAME", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         str(pid), str(nprocs), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(nprocs)]
    ok = False
    outs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
        if pr.returncode != 0:
            print(outs[-1])
            return 1
    if "MULTIHOST OK" in outs[0]:
        print(outs[0].strip().splitlines()[-1])
        ok = True
    return 0 if ok else 1


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
               int(sys.argv[i + 3]))
    else:
        n = 2
        if "--spawn" in sys.argv:
            n = int(sys.argv[sys.argv.index("--spawn") + 1])
        sys.exit(spawn(n))
