import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_op(name, kernel, out_shape, in_shapes):
    try:
        args = [jnp.asarray(np.random.default_rng(0).standard_normal(s), jnp.float32) for s in in_shapes]
        y = pl.pallas_call(kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*len(in_shapes),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(*out_shape))(*args)
        np.asarray(y)
        print(f"OK   {name}")
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"FAIL {name}: {msg}")

# 1. lane->sublane big split (1,1024)->(8,128)
try_op("reshape (1,1024)->(8,128)",
       lambda x, o: o.__setitem__(slice(None), x[:].reshape(8,128)),
       (((8,128)), jnp.float32), [(1,1024)])
# 2. back (8,128)->(1,1024)
try_op("reshape (8,128)->(1,1024)",
       lambda x, o: o.__setitem__(slice(None), x[:].reshape(1,1024)),
       (((1,1024)), jnp.float32), [(8,128)])
# 3. tiny (8,4)->(32,1)
try_op("reshape (8,4)->(32,1)",
       lambda x, o: o.__setitem__(slice(None), x[:].reshape(32,1)),
       (((32,1)), jnp.float32), [(8,4)])
# 4. lane slice (1,1024)[:, 128:256]
try_op("lane slice", lambda x, o: o.__setitem__(slice(None), x[:, 128:256]),
       (((1,128)), jnp.float32), [(1,1024)])
# 5. lane concat of 4 x (1,128) -> (1,512)
try_op("lane concat", lambda x, o: o.__setitem__(slice(None), jnp.concatenate([x[:, i*128:(i+1)*128] for i in range(4)], axis=1)),
       (((1,512)), jnp.float32), [(1,1024)])
# 6. sublane strided x[0::2]
try_op("sublane stride 2", lambda x, o: o.__setitem__(slice(None), x[0::2]),
       (((4,128)), jnp.float32), [(8,128)])
# 7. masked lane-group max to (8,1)
def k7(x, o):
    i = jax.lax.broadcasted_iota(jnp.int32, (8,128), 1) // 32
    o[:] = jnp.concatenate([jnp.max(jnp.where(i==g, jnp.abs(x[:]), 0.0), axis=1, keepdims=True) for g in range(4)], axis=1)
try_op("masked group max -> (8,4)", k7, (((8,4)), jnp.float32), [(8,128)])
# 8. (1,1024)->(1,4,2,128) 4D
try_op("reshape (1,1024)->(1,4,2,128)",
       lambda x, o: o.__setitem__(slice(None), x[:].reshape(1,4,2,128)),
       (((1,4,2,128)), jnp.float32), [(1,1024)])
# 9. (16,512)->(16,1,512) sublane add dim
try_op("reshape (16,512)->(16,1,512)",
       lambda x, o: o.__setitem__(slice(None), x[:].reshape(16,1,512)),
       (((16,1,512)), jnp.float32), [(16,512)])
# 10. int8 round/convert
def k10(x, o):
    o[:] = jnp.round(x[:] * 3.7).astype(jnp.int8).astype(jnp.float32)
try_op("round->int8->f32", k10, (((8,128)), jnp.float32), [(8,128)])
# 11. (8,4) slice even rows via dot with const
def k11(x, o):
    E = (jax.lax.broadcasted_iota(jnp.int32, (4,8), 1) == 2*jax.lax.broadcasted_iota(jnp.int32, (4,8), 0)).astype(jnp.float32)
    o[:] = jax.lax.dot_general(E, x[:], (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
try_op("const-E row select dot", k11, (((4,4)), jnp.float32), [(8,4)])
# 12. scratch dynamic lane store pl.dslice
def k12(x, o, scr):
    scr[:, pl.dslice(128, 128)] = x[:, 0:128]
    o[:] = scr[:, pl.dslice(128, 128)]
try_op("scratch dyn lane store", lambda x,o,s: k12(x,o,s), (((1,128)), jnp.float32), [(1,1024)]) if False else None
try:
    y = pl.pallas_call(k12,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1,128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 1024), jnp.float32)])(
        jnp.ones((1,1024), jnp.float32))
    np.asarray(y); print("OK   scratch dyn lane store")
except Exception as e:
    print("FAIL scratch dyn lane store:", str(e).split("\n")[0][:110])
