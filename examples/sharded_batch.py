"""Device-mesh data-parallel compression — the TPU-native analog of the
reference CLI's `-T8` multithreaded mode (lz4io.c:1125-1368). Runs on
any JAX device set (use XLA_FLAGS=--xla_force_host_platform_device_count=8
for a CPU demo)."""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lz4_tpu.block.encode_jax import DICT_CAP
from lz4_tpu.parallel.engine import linked_encode_step
from lz4_tpu.utils.datagen import mixed_corpus


def main():
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("data",))
    cap = 16384
    B = 4 * len(devs)
    data = mixed_corpus(B * cap, seed=7)
    src = np.frombuffer(data, np.uint8).reshape(B, cap).copy()
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    comp, csizes, offsets, total = linked_encode_step(
        jax.device_put(src, shard),
        jax.device_put(np.full(B, cap, np.int32), shard),
        jax.device_put(np.zeros((1, DICT_CAP), np.uint8), repl),
        jax.device_put(np.zeros(1, np.int32), repl),
        cap_n=cap, mesh=mesh)
    total = int(np.asarray(total)[0])
    print(f"{len(devs)} devices: {B * cap} -> {total} bytes "
          f"({100 * total / (B * cap):.1f}%), "
          f"offsets {np.asarray(offsets)[:4]}...")


if __name__ == "__main__":
    main()
