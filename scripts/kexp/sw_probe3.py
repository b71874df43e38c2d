"""Relay result-readback cost: scalar float() vs np.asarray of small and
large arrays, for the same underlying computation."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("device:", jax.devices()[0].device_kind)
    xs = [jax.random.normal(jax.random.PRNGKey(i), (20480, 768),
                            jnp.float32) for i in range(4)]

    @jax.jit
    def f_scalar(x):
        return jnp.sum(x * 1.0001)

    @jax.jit
    def f_small(x):
        return jnp.mean(x.reshape(8, 2560, 768), axis=1)   # (8, 768)

    @jax.jit
    def f_big(x):
        return x * 1.0001                                   # (20480, 768)

    def t(label, call):
        call(xs[0])
        ts = []
        for x in xs[1:]:
            t0 = time.perf_counter()
            call(x)
            ts.append(time.perf_counter() - t0)
        print(f"{label:28s} {min(ts)*1e3:8.0f} ms")

    t("scalar float()", lambda x: float(f_scalar(x)))
    t("(8,768) np.asarray", lambda x: np.asarray(f_small(x)))
    t("(20480,768) np.asarray", lambda x: np.asarray(f_big(x)))
    t("(8,768) float(sum) first",
      lambda x: (float(jnp.sum(f_small(x))), np.asarray(f_small(x))))


if __name__ == "__main__":
    main()
