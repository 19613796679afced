"""Progressive retrieval with MDR (counterpart of the reference mdr-x
refactor/reconstruct driver, src/mgard-x/Executables/mdr-x.cpp)."""

import numpy as np

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.models import mdr

x = np.linspace(0, 1, 65)
v = (np.sin(2 * np.pi * x)[:, None] * np.cos(np.pi * x)[None, :])

h = Hierarchy(v.shape)
# Refactor once...
res = mdr.mdr_refactor(h, v)

# ...retrieve progressively at successively tighter tolerances, fetching
# only the additional bitplanes each time.
rec = mdr.MDReconstructor(h, res.metadata)
fetched = [0] * len(res.metadata.levels)
for tol in (1e-1, 1e-3, 1e-5):
    counts = mdr.mdr_request(res.metadata, tol)
    nbytes = 0
    for l, c in enumerate(counts):
        streams = {0: res.streams[l][0]}
        for b in range(fetched[l], c):
            streams[1 + b] = res.streams[l][1 + b]
            nbytes += len(res.streams[l][1 + b])
        rec.add_streams(l, streams)
    fetched = [max(a, b) for a, b in zip(fetched, counts)]
    out = rec.reconstruct(counts)
    print(f"tol {tol:.0e}: fetched {nbytes:6d} more bytes, "
          f"err {np.abs(out - v).max():.2e}")
