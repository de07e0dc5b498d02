"""Refresh ORACLE_FPS.json to the CURRENT oracle texts.

Run at SESSION START, before editing any oracle: the driver's round-end
correctness run has just checked the window against these exact texts, so
recording them now means any oracle edited later in the session will
fingerprint-mismatch and re-enter the driver window at the next round
(queries/__init__._changed_oracles). Running this AFTER editing oracles
would erase the needs-recheck marker before the driver ever saw the new
text — don't.

Usage: python scripts/refresh_oracle_fps.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_trading_data_pipeline_spark.queries import REGISTRY  # noqa: E402

if __name__ == "__main__":
    fps = {
        n: hashlib.md5(s.oracle.encode()).hexdigest()
        for n, s in REGISTRY.items()
        if s.oracle is not None
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ORACLE_FPS.json")
    with open(out, "w") as f:
        json.dump(fps, f, indent=0, sort_keys=True)
    print(f"wrote {out}: {len(fps)} fingerprints")
