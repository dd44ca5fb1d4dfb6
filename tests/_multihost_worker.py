"""Worker for tests/test_multihost.py: one rank of a 2-process CPU-backend
distributed runtime. Prints ``PSUM_RESULT <v>`` after a cross-process global
sum so the parent can assert the collective really ran.

Run: python tests/_multihost_worker.py <port> <process_id> <kwargs|env>
"""

import os
import sys


def main():
    port, pid, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon
    import numpy as np

    from humanliff_tpu.parallel.mesh import initialize_multihost, make_mesh

    if mode == "kwargs":
        initialize_multihost(
            coordinator_address=f"localhost:{port}", num_processes=2,
            process_id=pid,
        )
    else:  # the reference-style env contract (dist_util.py:52-62 analog)
        os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        os.environ["JAX_NUM_PROCESSES"] = "2"
        os.environ["JAX_PROCESS_ID"] = str(pid)
        initialize_multihost()

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()
    sh = NamedSharding(mesh, P("data"))
    local = np.asarray([float(pid + 1)], np.float32)
    arr = jax.make_array_from_process_local_data(sh, local)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    print(f"PSUM_RESULT {float(total):.1f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
