"""Production-rate probe: the serve rejection path on trained artifacts.

VERDICT r2 next-step #4 asks for the `--reject`-equivalent production mode
timed under `serve`. This starts the warm HTTP service on a trained
artifact/experiment dir, issues judged `only_valid` generation requests,
and reports per-request wall-clock + effective guaranteed-valid mol/s
(device oversampling included, compile excluded — the first request warms).

Run: python scripts/serve_timing.py --exp-dir artifacts/hetro-edm \
         --n 512 --requests 3 --std 0.5 --polish 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp-dir", required=True)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--requests", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--std", type=float, default=0.7)
    ap.add_argument("--polish", type=int, default=0)
    ap.add_argument("--polish-t", type=float, default=0.05)
    ap.add_argument("--polish-noise", type=float, default=0.3)
    ap.add_argument("--polish-guide", default="")
    ap.add_argument("--polish-guide-scale", type=float, default=0.0)
    ap.add_argument("--max-rounds", type=int, default=4)
    ap.add_argument("--platform", default="",
                    help="e.g. cpu for smoke tests; default = device")
    args = ap.parse_args()

    from gaudi_tpu.cli.common import setup_platform

    setup_platform(args.platform)

    from gaudi_tpu.cli.serve import build_parser, create_server

    argv = ["--exp-dir", args.exp_dir, "--port", "0",
            "--batch-size", str(args.batch_size), "--std", str(args.std)]
    if args.polish:
        argv += ["--polish", str(args.polish), "--polish-t", str(args.polish_t),
                 "--polish-noise", str(args.polish_noise)]
        if args.polish_guide:
            argv += ["--polish-guide", args.polish_guide,
                     "--polish-guide-scale", str(args.polish_guide_scale)]
    srv, service = create_server(build_parser().parse_args(argv))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_port}/generate"

    def post(payload):
        req = urllib.request.Request(
            url, json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=3600) as r:
            return json.loads(r.read())

    # warm request (compile) — excluded from rates
    warm = post({"n": min(args.n, args.batch_size), "seed": 0,
                 "judge": True, "only_valid": True,
                 "max_rounds": args.max_rounds})
    print(json.dumps({"warm_seconds": warm.get("seconds"),
                      "warm_seconds_total": round(service.warm_seconds, 2)}),
          flush=True)

    rates = []
    for i in range(args.requests):
        t0 = time.time()
        out = post({"n": args.n, "seed": 100 + i, "judge": True,
                    "only_valid": True, "max_rounds": args.max_rounds})
        secs = time.time() - t0
        rec = {
            "request": i,
            "n": args.n,
            "n_returned": out.get("n_returned"),
            "seconds": round(secs, 3),
            "valid_mol_per_s": round(out.get("n_returned", 0) / secs, 2),
            "reject_rounds": out.get("rounds"),
            "device_batches": out.get("device_batches"),
        }
        rates.append(rec)
        print(json.dumps(rec), flush=True)
    srv.shutdown()
    best = max(r["valid_mol_per_s"] for r in rates)
    print(json.dumps({"exp_dir": args.exp_dir, "config": vars(args),
                      "best_valid_mol_per_s": best}))


if __name__ == "__main__":
    main()
