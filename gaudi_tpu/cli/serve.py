"""Production serving: a warm-model molecule-generation HTTP service.

Beyond-reference capability (the reference has batch scripts only). One
process owns the chip: the jitted sampling program is compiled once at
startup (persistent compile cache makes restarts start in seconds) and
every request reuses it — the request path is pure device execution plus
host chemistry judging. Standard-library HTTP only; no new dependencies.

    python -m gaudi_tpu.cli.serve --exp-dir runs/.../longrun-edm \
        --batch-size 512 --n-steps 100 --polish 3 --port 8099

    POST /generate  {"n": 32, "seed": 7, "judge": true,
                     "only_valid": true, "max_rounds": 3}
      -> {"molecules": [{"positions": [[x,y,z],...], "ring_types": [...],
                         "valid": true}, ...],
          "n_requested": 32, "n_returned": 32, "rounds": 1,
          "device_batches": 1, "seconds": 0.41}
    GET /health -> {"ok": true, ...}

Sampling configuration (std, strided steps, polish, physics priors,
conditional context / CFG) is fixed per server instance — it defines the
compiled program — while n / seed / judging are per-request. `only_valid`
is the rejection-resampling production mode: failing slots are redrawn
with fresh keys up to max_rounds, reusing the same compiled sampler.
"""

from __future__ import annotations

import argparse
import json
import threading
import time

from gaudi_tpu.cli.common import load_edm_from_dir, setup_platform


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp-dir", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8099)
    p.add_argument("--batch-size", type=int, default=256,
                   help="compiled device batch; requests are padded up to it")
    p.add_argument("--std", type=float, default=0.7)
    p.add_argument("--n-steps", type=int, default=0,
                   help="0 = full T (25 ODE steps under --solver dpmpp)")
    p.add_argument("--solver", default="ancestral",
                   choices=["ancestral", "dpmpp"],
                   help="dpmpp = DPM-Solver++(2M) ODE sampler (pair with "
                        "--n-steps 10-25)")
    p.add_argument("--solver-order", type=int, default=2, choices=[1, 2])
    p.add_argument("--polish", type=int, default=0)
    p.add_argument("--polish-t", type=float, default=0.08)
    p.add_argument("--polish-noise", type=float, default=1.0)
    p.add_argument("--polish-decay", type=float, default=0.6)
    p.add_argument("--polish-guide", default="")
    p.add_argument("--polish-guide-scale", type=float, default=0.0)
    p.add_argument("--cfg-weight", type=float, default=0.0)
    p.add_argument("--context-set", default="",
                   help="pin conditioning columns, e.g. 'VALID=1'")
    p.add_argument("--guide-predictor-dir", default="",
                   help="serve classifier-guided generation toward "
                        "--guide-target with this predictor")
    p.add_argument("--guide-target", default="min:GAP_eV")
    p.add_argument("--guide-scale", type=float, default=0.6)
    p.add_argument("--tol", type=float, default=0.1)
    p.add_argument("--eval-workers", type=int, default=0)
    p.add_argument("--platform", default="")
    return p


class GenerationService:
    """Owns the warm drawer + host judge; thread-safe via a device lock."""

    def __init__(self, args):
        from gaudi_tpu.cli.eval_validity import make_drawer

        self.cfg, self.trainer = load_edm_from_dir(args.exp_dir)
        self.args = args
        target_fn, guide_scale = None, 0.0
        if args.guide_predictor_dir:
            from gaudi_tpu.cli.common import load_predictor_from_dir
            from gaudi_tpu.cli.generate import make_target_function
            from gaudi_tpu.data import PropertyDistribution

            pred_cfg, pred_trainer = load_predictor_from_dir(
                args.guide_predictor_dir
            )
            target_fn = make_target_function(
                args.guide_target, pred_trainer.model,
                pred_trainer.state.params,
                PropertyDistribution(pred_trainer.train_ds),
                pred_cfg.data_config().targets,
            )
            guide_scale = args.guide_scale
        self.draw = make_drawer(
            self.trainer, args.batch_size, args.std,
            n_steps=args.n_steps or None,
            polish=args.polish, polish_t=args.polish_t,
            polish_noise=args.polish_noise, polish_decay=args.polish_decay,
            polish_guide=args.polish_guide,
            polish_guide_scale=args.polish_guide_scale,
            target_fn=target_fn, guide_scale=guide_scale,
            cfg_weight=args.cfg_weight, context_set=args.context_set,
            solver=args.solver, solver_order=args.solver_order,
        )
        self._lock = threading.Lock()
        # compile before accepting traffic (cache-hit restarts: seconds)
        t0 = time.time()
        self.draw(1, 0)
        self.warm_seconds = time.time() - t0

    def _judge(self, mols):
        from gaudi_tpu.eval_chem import analyze_chemical_validity_for_molecules

        cd = analyze_chemical_validity_for_molecules(
            mols, tol=self.args.tol, dataset=self.cfg.dataset,
            n_workers=self.args.eval_workers,
        )
        return list(cd["molecule_valid_bool"])

    def generate(self, n, seed=0, judge=False, only_valid=False,
                 max_rounds=3):
        """One request. Returns a JSON-able dict."""
        t0 = time.time()
        batches = 0
        rounds = 0
        out = []  # (positions, types, valid_or_None)
        # the lock only guards device execution — host-side judging runs
        # outside it so a concurrent request can start sampling while this
        # one judges (the chip is the serialized resource, not the CPU)
        with self._lock:
            mols, _ = self.draw(n, seed)
        batches += (n + self.args.batch_size - 1) // self.args.batch_size
        if judge or only_valid:
            flags = self._judge(mols)
            out = [(m[0], m[1], bool(v)) for m, v in zip(mols, flags)]
            if only_valid:
                out = [m for m in out if m[2]]
                while len(out) < n and rounds < max_rounds:
                    rounds += 1
                    need = n - len(out)
                    # the device computes whole static-shape batches
                    # regardless of how many we keep — judge an
                    # oversampled pool so each round's yield scales
                    # with the batch it already paid for (same pattern
                    # as eval_validity --reject)
                    n_fresh = min(
                        self.args.batch_size, max(4 * need, 32)
                    )
                    with self._lock:
                        mols, _ = self.draw(n_fresh, seed + 7919 * rounds)
                    batches += (
                        n_fresh + self.args.batch_size - 1
                    ) // self.args.batch_size
                    flags = self._judge(mols)
                    out += [
                        (m[0], m[1], True)
                        for m, v in zip(mols, flags) if v
                    ][:need]
                out = out[:n]
        else:
            out = [(m[0], m[1], None) for m in mols]
        return {
            "molecules": [
                {
                    "positions": p.tolist(),
                    "ring_types": t.tolist(),
                    **({"valid": v} if v is not None else {}),
                }
                for p, t, v in out
            ],
            "n_requested": n,
            "n_returned": len(out),
            "rounds": rounds,
            "device_batches": batches,
            "seconds": round(time.time() - t0, 4),
        }

    def health(self):
        return {
            "ok": True,
            "exp_dir": self.args.exp_dir,
            "dataset": self.cfg.dataset,
            "batch_size": self.args.batch_size,
            "n_steps": self.args.n_steps or (
                25 if self.args.solver == "dpmpp" else self.trainer.edm.T
            ),
            "solver": self.args.solver,
            "polish": self.args.polish,
            "warm_seconds": round(self.warm_seconds, 2),
        }


def create_server(args):
    """(HTTPServer, GenerationService) — separated from main() for tests."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    service = GenerationService(args)

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, service.health())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                n = int(req.get("n", 1))
                if not 1 <= n <= 100_000:
                    raise ValueError(f"n out of range: {n}")
                max_rounds = int(req.get("max_rounds", 3))
                if not 0 <= max_rounds <= 16:
                    # each round is a full compiled device batch under the
                    # service lock — an unbounded value lets one request
                    # pin the chip indefinitely
                    raise ValueError(f"max_rounds out of range: {max_rounds}")
                seed = int(req.get("seed", 0))
                judge = bool(req.get("judge", False))
                only_valid = bool(req.get("only_valid", False))
            except (ValueError, TypeError, json.JSONDecodeError) as e:
                # malformed request: client error, don't kill the server
                self._reply(400, {"error": str(e)})
                return
            try:
                result = service.generate(
                    n, seed=seed, judge=judge, only_valid=only_valid,
                    max_rounds=max_rounds,
                )
                self._reply(200, result)
            except Exception as e:
                # device/judge failure mid-request: a server fault (500),
                # so well-behaved clients know to retry
                self._reply(500, {"error": str(e)})

        def log_message(self, fmt, *a):  # quiet access log
            pass

    return ThreadingHTTPServer((args.host, args.port), Handler), service


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_platform(args.platform)
    server, service = create_server(args)
    print(
        f"serving {args.exp_dir} on http://{args.host}:{server.server_port} "
        f"(compile warm-up {service.warm_seconds:.1f}s)",
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
