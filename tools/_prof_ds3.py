import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, cProfile, pstats
from lowlightenvironmentvideoobjectdetection_tpu.models.mot.trackers import SortTracker
rng = np.random.RandomState(0)
tr = SortTracker()
N = 100
def frame(i):
    boxes = rng.uniform(0, 500, (N, 2)); wh = rng.uniform(20, 120, (N, 2))
    b = np.concatenate([boxes, boxes + wh], 1).astype(np.float32)
    s = rng.uniform(0.4, 1.0, N).astype(np.float32)
    l = np.zeros(N, np.int64)
    e = rng.randn(N, 2048).astype(np.float32)
    return b, s, l, e
for i in range(30):  # warm to ~250 tracks
    tr.track(i, *frame(i))
print("ntracks", len(tr.tracks))
pr = cProfile.Profile(); pr.enable()
for i in range(30, 60):
    tr.track(i, *frame(i))
pr.disable()
pstats.Stats(pr).sort_stats("cumulative").print_stats(18)
