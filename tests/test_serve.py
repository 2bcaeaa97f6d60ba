"""HTTP serving layer (cli/serve.py): warm drawer reuse, judging, rejection.

Beyond-reference production surface. Runs a real ThreadingHTTPServer on an
ephemeral port against a tiny trained-from-scratch model and exercises the
wire protocol end to end.
"""

import json
import threading
import urllib.error
import urllib.request

import pytest

from gaudi_tpu.config import EDMConfig
from gaudi_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve"))
    csv = generate_dataset(root, "cata", n_molecules=40, seed=0)
    cfg = EDMConfig(
        dataset="cata", csv_file=csv, xyz_root=root + "/cata-xyz",
        max_nodes=11, target_features="GAP_eV",
        n_layers=1, nf=16, diffusion_steps=10, batch_size=8,
        num_epochs=1, save_dir=root + "/summary", name="srv", lr=1e-3,
    )
    from gaudi_tpu.train.trainer_edm import EDMTrainer

    EDMTrainer(cfg).fit(num_epochs=1, sample_every=0)

    from gaudi_tpu.cli.serve import build_parser, create_server

    args = build_parser().parse_args(
        ["--exp-dir", cfg.exp_dir, "--port", "0", "--batch-size", "8",
         "--n-steps", "5"]
    )
    srv, service = create_server(args)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_port}", service
    srv.shutdown()


def _post(url, payload, path="/generate"):
    req = urllib.request.Request(
        url + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    url, service = server
    with urllib.request.urlopen(url + "/health", timeout=30) as r:
        body = json.loads(r.read())
    assert body["ok"] and body["dataset"] == "cata"
    assert body["warm_seconds"] >= 0


def test_generate_shapes_and_determinism(server):
    url, _ = server
    status, out = _post(url, {"n": 4, "seed": 11})
    assert status == 200
    assert out["n_returned"] == 4 and len(out["molecules"]) == 4
    m = out["molecules"][0]
    assert len(m["positions"]) == len(m["ring_types"]) >= 2
    assert len(m["positions"][0]) == 3
    assert "valid" not in m  # no judging requested
    # same seed -> same molecules (warm compiled program, pure PRNG)
    _, out2 = _post(url, {"n": 4, "seed": 11})
    assert out2["molecules"] == out["molecules"]
    _, out3 = _post(url, {"n": 4, "seed": 12})
    assert out3["molecules"] != out["molecules"]


def test_generate_judged(server):
    url, _ = server
    status, out = _post(url, {"n": 4, "seed": 3, "judge": True})
    assert status == 200
    assert all(isinstance(m["valid"], bool) for m in out["molecules"])


def test_only_valid_bounded_rounds(server):
    url, _ = server
    # untrained-quality model: likely nothing valid; the loop must stop at
    # max_rounds and return only judged-valid molecules
    status, out = _post(
        url, {"n": 3, "seed": 5, "only_valid": True, "max_rounds": 1}
    )
    assert status == 200
    assert out["rounds"] <= 1
    assert out["n_returned"] <= 3
    assert all(m["valid"] for m in out["molecules"])


def test_bad_request_and_unknown_path(server):
    url, _ = server
    status, out = _post(url, {"n": 0})
    assert status == 400 and "error" in out
    status, out = _post(url, {}, path="/nope")
    assert status == 404 and "error" in out
    # unbounded rejection loops are rejected up front (each round holds
    # the device lock for a full compiled batch)
    status, out = _post(
        url, {"n": 2, "only_valid": True, "max_rounds": 10**9}
    )
    assert status == 400 and "max_rounds" in out["error"]
    # the server survives bad requests
    status, out = _post(url, {"n": 2, "seed": 1})
    assert status == 200 and out["n_returned"] == 2


def test_guided_server(server, tmp_path_factory):
    """Classifier-guided serving: the guided drawer compiles at startup and
    serves judged requests."""
    from gaudi_tpu.config import PredictorConfig
    from gaudi_tpu.train.trainer_predictor import PredictorTrainer

    url, service = server
    ecfg = service.cfg
    root = str(tmp_path_factory.mktemp("serve_pred"))
    pcfg = PredictorConfig(
        dataset="cata", csv_file=ecfg.csv_file, xyz_root=ecfg.xyz_root,
        max_nodes=11, target_features="GAP_eV",
        n_layers=1, nf=16, batch_size=8, num_epochs=1,
        save_dir=root, name="srvp",
    )
    tr = PredictorTrainer(pcfg, edm_cfg=ecfg)
    tr.fit(num_epochs=1)

    from gaudi_tpu.cli.serve import build_parser, create_server

    args = build_parser().parse_args(
        ["--exp-dir", ecfg.exp_dir, "--port", "0", "--batch-size", "8",
         "--n-steps", "5", "--guide-predictor-dir", pcfg.exp_dir,
         "--guide-target", "min:GAP_eV", "--guide-scale", "0.3"]
    )
    srv, _ = create_server(args)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    gurl = f"http://127.0.0.1:{srv.server_port}"
    status, out = _post(gurl, {"n": 2, "seed": 1, "judge": True})
    srv.shutdown()
    assert status == 200 and out["n_returned"] == 2
    assert all(isinstance(m["valid"], bool) for m in out["molecules"])


def test_internal_fault_maps_to_500(server):
    """Device/judge failures mid-request are server faults (500), not
    client errors (regression: the blanket handler replied 400)."""
    url, service = server
    orig = service.generate

    def boom(*a, **k):
        raise RuntimeError("device fell over")

    service.generate = boom
    try:
        status, out = _post(url, {"n": 1})
        assert status == 500 and "device fell over" in out["error"]
    finally:
        service.generate = orig
    # and the server still works afterwards
    status, out = _post(url, {"n": 1, "seed": 2})
    assert status == 200 and out["n_returned"] == 1
