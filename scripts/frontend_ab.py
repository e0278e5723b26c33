"""On-chip micro-A/B: embedding-lookup backward — XLA scatter-add vs
one-hot matmul contraction.

The training profile's XLA tail includes the input frontend; the embed
gather's VJP lowers to a scatter-add on TPU, which serializes. The
candidate replacement contracts a blocked one-hot against the cotangent
((Q, B*Tc) @ (B*Tc, C) per chunk under lax.scan) — pure MXU work.

    python scripts/frontend_ab.py      # FE_BATCH / FE_T / FE_REPS
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    plat = os.environ.get("WAVENET_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    b = int(os.environ.get("FE_BATCH", "8"))
    t = int(os.environ.get("FE_T", "9214"))
    q, c = 256, 64
    reps = int(os.environ.get("FE_REPS", "6"))
    inner = int(os.environ.get("FE_INNER", "20"))

    embed = jax.random.normal(jax.random.key(0), (q, c))
    w = jax.random.normal(jax.random.key(1), (c, c))
    x = jax.random.randint(jax.random.key(2), (b, t), 0, q)

    def loss_gather(embed):
        e = embed[x]                       # (B, T, C) gather
        return jnp.sum(jnp.tanh(e @ w))

    @jax.custom_vjp
    def lookup(embed):
        return embed[x]

    def lookup_fwd(embed):
        return embed[x], None

    def lookup_bwd(_, g):
        # Blocked one-hot contraction: scan over T chunks, accumulate
        # (Q, C) on the MXU; no scatter anywhere.
        chunk = 1024
        t_pad = -(-t // chunk) * chunk
        xp = jnp.pad(x, ((0, 0), (0, t_pad - t)), constant_values=q)
        gp = jnp.pad(g, ((0, 0), (0, t_pad - t), (0, 0)))
        xc = xp.reshape(b, t_pad // chunk, chunk).transpose(1, 0, 2)
        gc = gp.reshape(b, t_pad // chunk, chunk, c).transpose(1, 0, 2, 3)

        def body(acc, inp):
            xi, gi = inp                   # (B, chunk), (B, chunk, C)
            flat_x = xi.reshape(-1)
            flat_g = gi.reshape(-1, c)
            onehot = (
                flat_x[:, None] == jnp.arange(q)[None, :]
            ).astype(jnp.bfloat16)         # (B*chunk, Q)
            return acc + jax.lax.dot_general(
                onehot, flat_g.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((q, c), jnp.float32), (xc, gc)
        )
        return (acc,)

    lookup.defvjp(lookup_fwd, lookup_bwd)

    def loss_matmul(embed):
        e = lookup(embed)
        return jnp.sum(jnp.tanh(e @ w))

    fns = {
        "scatter": jax.jit(jax.grad(loss_gather)),
        "onehot_mm": jax.jit(jax.grad(loss_matmul)),
    }

    def run(name, k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fns[name](embed)
        s = float(np.asarray(out.sum()))
        return time.perf_counter() - t0, s

    for name in fns:
        t0 = time.perf_counter()
        _, s = run(name, 1)
        print(json.dumps({"compiled": name,
                          "s": round(time.perf_counter() - t0, 1),
                          "checksum": round(s, 3)}), flush=True)

    times = {name: [] for name in fns}
    for rep in range(reps):
        for name in fns:
            dt, _ = run(name, inner)
            times[name].append(dt / inner)
            print(json.dumps({
                "rep": rep, "variant": name,
                "ms": round(1e3 * dt / inner, 3),
            }), flush=True)
    out = {"batch": b, "t": t}
    for name in fns:
        ts = sorted(times[name])
        out[name] = {"best_ms": round(1e3 * ts[0], 3),
                     "median_ms": round(1e3 * ts[len(ts) // 2], 3)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    main()
