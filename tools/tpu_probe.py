"""Quick TPU backend health probe (the tunneled axon backend wedges for
10-20 min after a kernel fault).  Healthy = device listed AND a small
matmul round-trips in a few seconds.  Exit 0 healthy / 1 sick."""
import sys
import time

import numpy as np


def main():
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    devs = jax.devices()
    t_dev = time.perf_counter() - t0
    x = jnp.ones((256, 256), jnp.float32)
    y = np.asarray(x @ x)
    t_all = time.perf_counter() - t0
    ok = y[0, 0] == 256.0 and t_all < 30.0
    print(f"devices={devs} t_devices={t_dev:.1f}s t_roundtrip={t_all:.1f}s "
          f"healthy={ok}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
