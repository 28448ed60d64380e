import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, numpy as np, jax, jax.numpy as jnp
from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS
from lowlightenvironmentvideoobjectdetection_tpu import zoo
m = MODELS.get("DeepSORT")(num_classes=1)
h, w = m.detector.cfg.pad_h, m.detector.cfg.pad_w
rng = np.random.RandomState(0)
frames = [jnp.asarray(rng.uniform(-2,2,(h,w,3)), jnp.float32) for _ in range(8)]
shape = np.asarray([600.,1000.])
m.track_frame(0, frames[0], shape)
# (a) device step only, chained block_until_ready
out = m.dispatch_detect(frames[0], shape)
jax.block_until_ready(out)
t0=time.perf_counter()
for i in range(30):
    out = m.dispatch_detect(frames[i%8], shape)
    jax.block_until_ready(out)
ta=(time.perf_counter()-t0)/30
# (b) device step, pipelined depth3 with block
outs=[]
t0=time.perf_counter()
pend=[]
for i in range(30):
    pend.append(m.dispatch_detect(frames[i%8], shape))
    if len(pend)>3: jax.block_until_ready(pend.pop(0))
for p in pend: jax.block_until_ready(p)
tb=(time.perf_counter()-t0)/30
# (c) device_get cost after ready
out = m.dispatch_detect(frames[0], shape); jax.block_until_ready(out)
t0=time.perf_counter()
for i in range(20): jax.device_get(out)
tc=(time.perf_counter()-t0)/20
# (d) host association cost
boxes,scores,labels,embeds = m._fetch_detections(out)
t0=time.perf_counter()
for i in range(1,31): m.tracker.track(i, boxes, scores, labels, embeds)
td=(time.perf_counter()-t0)/30
print(f"block-chain {ta*1e3:.1f} ms  pipelined-block {tb*1e3:.1f} ms  device_get(ready) {tc*1e3:.1f} ms  assoc {td*1e3:.1f} ms")
