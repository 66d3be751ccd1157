#!/bin/bash
# Poll for axon TPU availability: one init+tiny-compute attempt every
# ~10 min, exit 0 the moment compute works. Failed *init* attempts take no
# claim (the wedge protocol concern is killing a client mid-compute, which
# this never does: each attempt runs to completion, success or error).
while true; do
  echo "=== probe at $(date) ==="
  python - <<'EOF'
import jax, time, sys
t0 = time.time()
try:
    d = jax.devices()
    print("devices:", d, flush=True)
    import jax.numpy as jnp
    import numpy as np
    x = jnp.ones((256, 256))
    y = np.asarray(jax.device_get(x @ x))
    print("compute ok, sum=", float(y.sum()), "elapsed", time.time() - t0,
          flush=True)
    sys.exit(0)
except Exception as e:
    print("probe failed after", round(time.time() - t0, 1), "s:",
          type(e).__name__, str(e)[:200], flush=True)
    sys.exit(1)
EOF
  if [ $? -eq 0 ]; then
    echo "TPU AVAILABLE at $(date)"
    exit 0
  fi
  sleep 600
done
