import time, jax, jax.numpy as jnp, numpy as np
n = 256*256*64
R = 17
state = jnp.asarray(np.random.rand(R, n).astype(np.float32))

def timeit(f, *args, reps=3):
    out = f(*args); s = float(np.asarray(jnp.sum(out[0] if isinstance(out, tuple) else out)))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(reps):
        out = f(*args)
        acc += float(np.asarray(jnp.sum(out[0] if isinstance(out, tuple) else out)))
    return (time.perf_counter()-t0)/reps*1e3

@jax.jit
def col_take(state):
    key = (state[0]*1e6).astype(jnp.int32)
    order = jnp.argsort(key)
    return jnp.take(state, order, axis=1)

@jax.jit
def row_take(state):
    key = (state[0]*1e6).astype(jnp.int32)
    order = jnp.argsort(key)
    return jnp.take(state.T, order, axis=0).T

@jax.jit
def variadic(state):
    key = (state[0]*1e6).astype(jnp.int32)
    ops = [key] + [state[i] for i in range(R)]
    res = jax.lax.sort(ops, num_keys=1)
    return jnp.stack(res[1:])

@jax.jit
def argsort_only(state):
    key = (state[0]*1e6).astype(jnp.int32)
    return jnp.argsort(key)

print("argsort only : %.1f ms" % timeit(argsort_only, state))
print("col take     : %.1f ms" % timeit(col_take, state))
print("row take     : %.1f ms" % timeit(row_take, state))
print("variadic sort: %.1f ms" % timeit(variadic, state))
