"""Per-primitive profile of the strict-IEEE NumPy residual evaluator
(taylor.numpy_eval) on the armadillo-small graphs — VERDICT r3 weak
item 3: 1.2-1.6 s per restart, ~15-20% of the warm solve."""

import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

import sanm_tpu  # noqa: E402  (platform setup)
from sanm_tpu.fea.app import (  # noqa: E402
    read_json, energy_model_of, make_material_property,
)
from sanm_tpu.fea.mesh import TetrahedralMesh  # noqa: E402
from sanm_tpu.fea.model import DeformableBody  # noqa: E402
from sanm_tpu import taylor  # noqa: E402

energy = sys.argv[1] if len(sys.argv) > 1 else "neohookean_c"

mesh = TetrahedralMesh.from_tetgen_files("configs/model/Armadillo-small.1")
cfg = read_json("configs/armadillo_small.json")
cfg["energy_model"] = energy
body = DeformableBody(make_material_property(cfg["material"]), mesh)
lowz = np.asarray(mesh.vertices)[:, 2]
body.coord_fixed_mask[
    lowz <= lowz.min() + 0.05 * (lowz.max() - lowz.min())
] = True
model = body.make_forward(energy_model_of(cfg))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

tfn = taylor.TaylorFn(
    model.fn,
    jax.ShapeDtypeStruct(model.lt_inp.remap.out_shape, jnp.float64),
)
x0 = np.asarray(model.x0())

gin = model.lt_inp.remap.apply_np(x0)
run = taylor.numpy_eval(tfn)
out = run(gin)
t0 = time.perf_counter()
for _ in range(3):
    out = run(gin)
tot = (time.perf_counter() - t0) / 3
print(f"{energy}: total numpy_eval {tot:.3f}s  "
      f"({len(tfn.live_eqns)} live eqns, gin {np.shape(gin)})")

# per-primitive breakdown: re-run with a timing shim around impl
import sanm_tpu.taylor as T  # noqa: E402

times = defaultdict(float)
counts = defaultdict(int)


def timed_eval(tfn):
    inner = T.numpy_eval(tfn)
    return inner


# simpler: inline interpreter copy with timing
import jax._src.core as jcore  # noqa: E402

consts = [np.asarray(c) for c in tfn.consts]
env = {}
for v, c in zip(tfn.jaxpr.constvars, consts):
    env[v] = c
for v, x in zip(tfn.jaxpr.invars, [np.asarray(gin)]):
    env[v] = x


def read(v):
    return np.asarray(v.val) if isinstance(v, jcore.Literal) else env[v]


# grab the impl closure out of numpy_eval by rebuilding it: call the
# module-private pieces through a fresh evaluator's cell
ev = T.numpy_eval(tfn)
impl = None
for cell in ev.__closure__:
    c = cell.cell_contents
    if callable(c) and getattr(c, "__name__", "") == "impl":
        impl = c
if impl is None:
    sys.exit("could not extract impl closure")

for idx, eqn, outs_used in tfn.live_eqns:
    invals = [read(v) for v in eqn.invars]
    t0 = time.perf_counter()
    out = impl(eqn, invals)
    dt = time.perf_counter() - t0
    key = eqn.primitive.name
    times[key] += dt
    counts[key] += 1
    outs = out if eqn.primitive.multiple_results else [out]
    for v, o in zip(eqn.outvars, outs):
        if not isinstance(v, jcore.DropVar):
            env[v] = o

print(f"{'primitive':<24}{'calls':>6}{'total_s':>10}")
for k in sorted(times, key=times.get, reverse=True):
    print(f"{k:<24}{counts[k]:>6}{times[k]:>10.4f}")
print(f"{'SUM':<24}{sum(counts.values()):>6}{sum(times.values()):>10.4f}")
