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
from collections import deque
pend = deque(); t_fetch=t_assoc=t_disp=0.0
m.tracker.reset()
N=60
t00=time.perf_counter()
fid=0; i=0
while fid < N:
    while i < N and len(pend)<3:
        t0=time.perf_counter(); pend.append(m.dispatch_detect(frames[i%8], shape)); t_disp+=time.perf_counter()-t0; i+=1
    t0=time.perf_counter(); boxes,scores,labels,embeds = m._fetch_detections(pend.popleft()); t_fetch+=time.perf_counter()-t0
    t0=time.perf_counter(); m.tracker.track(fid, boxes, scores, labels, embeds); t_assoc+=time.perf_counter()-t0
    fid+=1
tot=time.perf_counter()-t00
print(f"total {tot/N*1e3:.1f} ms/f  dispatch {t_disp/N*1e3:.1f}  fetch {t_fetch/N*1e3:.1f}  assoc {t_assoc/N*1e3:.1f}  ntracks {len(m.tracker.tracks)}")
