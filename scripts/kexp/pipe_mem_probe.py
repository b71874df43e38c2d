"""Pipeline-parallel memory probe (CPU mesh, XLA memory_analysis).

Quantifies parallel/pipeline.py's remat claim: per-device compiled temp
memory of a gradient step through an 8-layer 256-wide encoder at 1024
tokens, batch 8, 4 pipe stages x 4 microbatches, vs the dense all-layers
-on-one-device gradient. Round-3 measured (see BENCHMARKS.md):

    dense grad (1 device)              3609 MiB temp
    pipeline grad remat=False          2019 MiB / device
    pipeline grad remat=True            351 MiB / device
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from smb_vision_tpu.models.layers import Block, Encoder  # noqa: E402
from smb_vision_tpu.parallel.pipeline import (  # noqa: E402
    pipeline_apply,
    stack_layer_params,
)

HID, HEADS, INTER, L = 256, 4, 1024, 8


def main():
    key = jax.random.PRNGKey(0)
    enc = Encoder(num_layers=L, hidden_size=HID, num_heads=HEADS,
                  intermediate_size=INTER, dtype=jnp.float32,
                  attn_impl="xla")
    x = jax.random.normal(key, (8, 1024, HID))
    params = enc.init(key, x)
    stacked, _ = stack_layer_params(params["params"])
    block = Block(HID, HEADS, INTER, dtype=jnp.float32, attn_impl="xla")
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))

    def report(name, fn, *args):
        m = jax.jit(fn).lower(*args).compile().memory_analysis()
        print(f"{name}: temp {m.temp_size_in_bytes / 2**20:.0f} MiB, "
              f"output {m.output_size_in_bytes / 2**20:.0f} MiB")

    def loss_pipe(remat):
        def f(s):
            y = pipeline_apply(
                lambda p, h: block.apply({"params": p}, h, None, True),
                s, x, mesh=mesh, axis="pipe", num_microbatches=4,
                remat=remat)
            return jnp.mean(y ** 2)
        return f

    def loss_dense(p):
        return jnp.mean(enc.apply(p, x) ** 2)

    report("dense grad (all layers on 1 device)",
           jax.grad(loss_dense), params)
    report("pipeline grad remat=False (per-device share)",
           jax.grad(loss_pipe(False)), stacked)
    report("pipeline grad remat=True  (per-device share)",
           jax.grad(loss_pipe(True)), stacked)


if __name__ == "__main__":
    main()
