#!/usr/bin/env bash
# Pending on-chip validations/A-Bs (run when the TPU tunnel is available).
# Each step is independent; everything prints to stdout.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"

echo "== 1. offset flash kernel (context parallelism): numeric + bench =="
timeout 900 python examples/bench_context_attention.py 8000 8

echo "== 2. flash single-block v1 vs v3 (MXU softmax denominator) =="
for impl in v1 v3 v1 v3; do
  VAP_FLASH_SINGLE_IMPL=$impl timeout 900 python - <<'EOF'
import os, time
import numpy as np
import jax, jax.numpy as jnp
from voiceactivityprojection_tpu.utils.runtime import setup_runtime
setup_runtime()
from voiceactivityprojection_tpu.ops.attention import alibi_slopes
from voiceactivityprojection_tpu.ops import flash_alibi as fa
B, H, T, Dh = 64, 4, 1000, 64
scale = 1.0 / np.sqrt(H * Dh)
rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.bfloat16)
q, k, v = mk(), mk(), mk()
slopes = alibi_slopes(H)
f = jax.jit(lambda q, k, v: fa._single_block_forward(q, k, v, slopes, scale))
dense = jax.jit(lambda q, k, v: fa._dense_reference(
    q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), slopes, scale))
err = float(jnp.abs(f(q, k, v).astype(jnp.float32) - dense(q, k, v)).max())
acc = jnp.zeros(())
for _ in range(10):
    acc = acc + f(q, k, v).astype(jnp.float32).sum()
float(acc)
t0 = time.time(); acc = jnp.zeros(())
for _ in range(25):
    acc = acc + f(q, k, v).astype(jnp.float32).sum()
float(acc)
impl = os.environ.get("VAP_FLASH_SINGLE_IMPL")
print(f"{impl}: {(time.time()-t0)/25*1e3:.3f} ms/pass (err {err:.1e})")
EOF
done

echo "== 3. GRU groups A/B (VAP_GRU_GROUPS=1/2/4) =="
for g in 1 2 4 1 2 4; do
  VAP_GRU_GROUPS=$g timeout 900 python - <<'EOF'
import os, time
import numpy as np
import jax, jax.numpy as jnp
from voiceactivityprojection_tpu.utils.runtime import setup_runtime
setup_runtime()
from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.vap import init_vap
from voiceactivityprojection_tpu.ops.gru import gru
conf = VapConfig(dtype="bfloat16")
params = init_vap(jax.random.key(0), conf)
bf = jnp.bfloat16
gp = jax.tree.map(lambda x: x.astype(bf) if x.dtype == jnp.float32 else x,
                  params["encoder"]["gAR"])
rng = np.random.default_rng(0)
z = jnp.asarray(rng.normal(size=(128, 2000, 256)), bf)
f = jax.jit(lambda z: gru(gp, z)[0])
acc = jnp.zeros(())
for _ in range(8):
    acc = acc + f(z).astype(jnp.float32).sum()
float(acc)
t0 = time.time(); acc = jnp.zeros(())
for _ in range(10):
    acc = acc + f(z).astype(jnp.float32).sum()
float(acc)
print(f"groups={os.environ.get('VAP_GRU_GROUPS')}: {(time.time()-t0)/10*1e3:.2f} ms")
EOF
done

echo "== 4. bench sanity =="
timeout 1200 python bench.py

echo "== 5. GRU+downsample fused epilogue A/B (VAP_GRU_DS) =="
for mode in off fused off fused; do
  env_arg=""
  [ "$mode" = fused ] && env_arg="VAP_GRU_DS=fused"
  env $env_arg timeout 900 python - <<'PYEOF'
import os, time
import numpy as np
import jax, jax.numpy as jnp
from voiceactivityprojection_tpu.utils.runtime import setup_runtime
setup_runtime()
from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.vap import init_vap
from voiceactivityprojection_tpu.models.encoder import apply_encoder
conf = VapConfig(dtype="bfloat16")
params = init_vap(jax.random.key(0), conf)
bf = jnp.bfloat16
enc = jax.tree.map(lambda x: x.astype(bf) if x.dtype == jnp.float32 else x,
                   params["encoder"])
rng = np.random.default_rng(0)
w = jnp.asarray(rng.normal(size=(128, 320_000)).astype(np.float32) * 0.1, bf)
f = jax.jit(lambda w: apply_encoder(enc, w, fused_auto=True))
chk = float(f(w).astype(jnp.float32).sum())
acc = jnp.zeros(())
for _ in range(8):
    acc = acc + f(w).astype(jnp.float32).sum()
float(acc)
t0 = time.time(); acc = jnp.zeros(())
for _ in range(10):
    acc = acc + f(w).astype(jnp.float32).sum()
float(acc)
mode = os.environ.get("VAP_GRU_DS", "off")
print(f"encoder VAP_GRU_DS={mode}: {(time.time()-t0)/10*1e3:.2f} ms (chk {chk:.1f})")
PYEOF
done

echo "== 5b. combined knobs: VAP_GRU_DS=fused x VAP_GRU_GROUPS=2/4 =="
for g in 2 4; do
  VAP_GRU_DS=fused VAP_GRU_GROUPS=$g timeout 900 python - <<'PYEOF'
import os, time
import numpy as np
import jax, jax.numpy as jnp
from voiceactivityprojection_tpu.utils.runtime import setup_runtime
setup_runtime()
from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.vap import init_vap
from voiceactivityprojection_tpu.models.encoder import apply_encoder
conf = VapConfig(dtype="bfloat16")
params = init_vap(jax.random.key(0), conf)
bf = jnp.bfloat16
enc = jax.tree.map(lambda x: x.astype(bf) if x.dtype == jnp.float32 else x,
                   params["encoder"])
rng = np.random.default_rng(0)
w = jnp.asarray(rng.normal(size=(128, 320_000)).astype(np.float32) * 0.1, bf)
f = jax.jit(lambda w: apply_encoder(enc, w, fused_auto=True))
chk = float(f(w).astype(jnp.float32).sum())
acc = jnp.zeros(())
for _ in range(8):
    acc = acc + f(w).astype(jnp.float32).sum()
float(acc)
t0 = time.time(); acc = jnp.zeros(())
for _ in range(10):
    acc = acc + f(w).astype(jnp.float32).sum()
float(acc)
g = os.environ.get("VAP_GRU_GROUPS")
print(f"encoder DS=fused groups={g}: {(time.time()-t0)/10*1e3:.2f} ms (chk {chk:.1f})")
PYEOF
done

echo "== 6. conv T1OUT retune post in-kernel expand =="
for t1 in 1024 2048 1024 2048; do
  VAP_CONV_T1OUT=$t1 timeout 900 python - <<'PYEOF'
import os, time
import numpy as np
import jax, jax.numpy as jnp
from voiceactivityprojection_tpu.utils.runtime import setup_runtime
setup_runtime()
from voiceactivityprojection_tpu.ops import conv_stack_fused as csf
from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.vap import init_vap
bf = jnp.bfloat16
params = init_vap(jax.random.key(0), VapConfig(dtype="bfloat16"))
enc = jax.tree.map(lambda x: x.astype(bf) if x.dtype == jnp.float32 else x,
                   params["encoder"])
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(128, 320_000)).astype(np.float32) * 0.1, bf)
f = jax.jit(lambda a: csf.fused_conv_stack(enc, a))
acc = jnp.zeros(())
for _ in range(8):
    acc = acc + f(x).astype(jnp.float32).sum()
float(acc)
t0 = time.time(); acc = jnp.zeros(())
for _ in range(10):
    acc = acc + f(x).astype(jnp.float32).sum()
float(acc)
print(f"T1OUT={os.environ['VAP_CONV_T1OUT']}: {(time.time()-t0)/10*1e3:.2f} ms")
PYEOF
done
