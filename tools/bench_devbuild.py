"""Index-build timing at chr21 scale (46.7 Mb synthetic): host native C++
build vs device (ops/devbuild) build. Usage:
    python tools/bench_devbuild.py [mbases]
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np

MB = float(sys.argv[1]) if len(sys.argv) > 1 else 46.7
GLEN = int(MB * 1e6)

rng = np.random.default_rng(21)
genome = rng.integers(0, 4, GLEN).astype(np.uint8)
print(f"genome: {GLEN/1e6:.1f} Mb synthetic", file=sys.stderr)

from linear_tpu.index import dindex as DI
from linear_tpu.map import nengine as NE

t0 = time.time()
nat = NE.build_dindex_native([genome], DI.DEFAULT_SPAN, DI.DEFAULT_WEIGHT,
                             DI.DEFAULT_MIN_STEP, DI.DEFAULT_MAX_STEP,
                             DI.DEFAULT_OMIT_BLOCK, 16)
t_nat = time.time() - t0
print(f"host native build: {t_nat:.2f}s"
      + ("" if nat else " (native lib unavailable)"))

from linear_tpu.ops import devbuild as DB

t0 = time.time()
dirp, scord, n_kept = DB.build_dindex_device([genome])
import jax

jax.block_until_ready((dirp, scord))
t_dev_cold = time.time() - t0
t0 = time.time()
dirp, scord, n_kept = DB.build_dindex_device([genome])
jax.block_until_ready((dirp, scord))
t_dev = time.time() - t0
print(f"device build: cold {t_dev_cold:.2f}s  warm {t_dev:.2f}s  "
      f"entries {n_kept}")
if nat is not None:
    host_dir, host_hs = nat[0], nat[1]
    ok = (np.asarray(dirp) == host_dir).all() and \
         (np.asarray(scord[:n_kept]).view(np.uint64) == host_hs).all()
    print(f"device == host: {ok}")
