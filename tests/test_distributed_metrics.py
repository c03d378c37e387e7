"""Multi-process metric reduction — the stgx implementation of the
reference's never-implemented DDP metric reduce
(/root/reference/utils/metrics/metric.py:39-40, called at
processor.py:676,816).

Two layers of proof:

* injected-gather unit tests: a fake two-process allgather drives ``reduce``
  and the combined value must equal a single process visiting all trials;
* a REAL two-process ``jax.distributed`` CPU session (subprocesses) where
  each process evaluates a disjoint trial shard and both must reduce to the
  identical global value.
"""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np

from stgx.utils.metrics import ConfusionMatrix, EditScore, F1Score

RNG = np.random.default_rng(7)


def _trial(seed, L=120, C=5):
    rng = np.random.default_rng(seed)
    labels = np.repeat(rng.integers(0, C, size=8), -(-L // 8))[:L].astype(np.int64)
    predicted = labels.copy()
    flip = rng.random(L) < 0.3
    predicted[flip] = rng.integers(0, C, size=flip.sum())
    return labels, predicted


def test_reduce_two_fake_processes_matches_single():
    """reduce() with an injected 2-process gather == one process seeing all
    trials, for all three metrics."""
    trials = [_trial(s) for s in range(6)]

    # single process over everything
    ref_f1 = F1Score(5)
    ref_edit = EditScore(5)
    ref_conf = ConfusionMatrix(5)
    for m in (ref_f1, ref_edit, ref_conf):
        m.init_metric(len(trials))
    for y, p in trials:
        ref_f1(y, p), ref_edit(y, p), ref_conf(y, p)
    for m in (ref_f1, ref_edit, ref_conf):
        m.reduce()

    # two fake processes with uneven shards (4 + 2 trials)
    shards = [trials[:4], trials[4:]]
    locals_ = []
    for shard in shards:
        f1, ed, cf = F1Score(5), EditScore(5), ConfusionMatrix(5)
        for m in (f1, ed, cf):
            m.init_metric(len(shard))
        for y, p in shard:
            f1(y, p), ed(y, p), cf(y, p)
        locals_.append((f1, ed, cf))

    for rank in (0, 1):
        other = 1 - rank

        def gather(x, _rank=rank, _other=other, _locals=locals_):
            # a process allgather: stack both processes' contribution of the
            # same-shaped local array, process-major. We reproduce the other
            # process's contribution by running the same code on its state.
            mine = np.asarray(x)
            theirs = gather.pending.pop(0)
            pair = [None, None]
            pair[_rank] = mine
            pair[_other] = theirs
            return np.stack(pair)

        f1, ed, cf = locals_[rank]
        of1, oed, ocf = locals_[other]
        # what the other process would contribute, in call order:
        # counts then padded rows (F1), counts then rows (edit), matrix (conf)
        cap = max(f1.metric.shape[0], of1.metric.shape[0])

        def padded(m, cap):
            out = np.zeros((cap,) + m.metric.shape[1:], m.metric.dtype)
            out[: m.trial_id] = m.metric[: m.trial_id]
            return out

        # NB: each reduce() below re-computes from pristine per-trial state,
        # so copy the state first — reduce mutates .metric
        import copy

        f1c, edc, cfc = (copy.deepcopy(m) for m in (f1, ed, cf))
        gather.pending = [
            np.asarray([of1.trial_id]), padded(of1, cap),
        ]
        f1c.reduce(gather=gather)
        gather.pending = [
            np.asarray([oed.trial_id]), padded(oed, cap),
        ]
        edc.reduce(gather=gather)
        gather.pending = [ocf.metric]
        cfc.reduce(gather=gather)

        np.testing.assert_allclose(f1c.metric, ref_f1.metric, rtol=1e-6)
        np.testing.assert_allclose(edc.metric, ref_edit.metric, rtol=1e-6)
        np.testing.assert_array_equal(cfc.metric, ref_conf.metric)


def test_reduce_truncated_eval_ignores_unvisited_rows():
    """init_metric(10) but only 3 trials visited → mean over the 3, not over
    zero-filled rows (the reference-era dilution bug, VERDICT weak #6)."""
    f1 = F1Score(5)
    f1.init_metric(10)
    for s in range(3):
        y, p = _trial(s)
        f1(y, p)
    visited = f1.metric[:3].copy()
    f1.reduce()
    np.testing.assert_allclose(f1.metric, np.nan_to_num(visited).mean(axis=0))

    ed = EditScore(5)
    ed.init_metric(10)
    for s in range(3):
        y, p = _trial(s)
        ed(y, p)
    visited = ed.metric[:3].copy()
    ed.reduce()
    np.testing.assert_allclose(ed.metric, visited.mean(axis=0))


_WORKER = textwrap.dedent(
    """
    import json, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    jax.distributed.initialize(
        coordinator_address="localhost:%d", num_processes=2, process_id=pid
    )
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, %r)
    from test_distributed_metrics import _trial
    from stgx.utils.metrics import ConfusionMatrix, EditScore, F1Score

    trials = [_trial(s) for s in range(6)]
    shard = trials[:4] if pid == 0 else trials[4:]
    f1, ed, cf = F1Score(5), EditScore(5), ConfusionMatrix(5)
    for m in (f1, ed, cf):
        m.init_metric(len(shard))
    for y, p in shard:
        f1(y, p), ed(y, p), cf(y, p)
    for m in (f1, ed, cf):
        m.reduce()
    print("RESULT" + json.dumps({
        "pid": pid,
        "f1": np.asarray(f1.metric).tolist(),
        "edit": np.asarray(ed.metric).tolist(),
        "conf_sum": int(cf.metric.sum()),
        "conf_diag": int(np.trace(cf.metric)),
    }), flush=True)
    """
)


def test_reduce_real_two_process_session(tmp_path):
    """Both processes of a real jax.distributed CPU session reduce their
    disjoint shards to the same global metric values."""
    port = 19841
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % (port, os.path.dirname(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo", env=env,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    results = {}
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, f"worker produced no RESULT:\n{out}"
        r = json.loads(lines[0][len("RESULT"):])
        results[r["pid"]] = r
    assert set(results) == {0, 1}

    # both processes agree
    np.testing.assert_allclose(results[0]["f1"], results[1]["f1"])
    np.testing.assert_allclose(results[0]["edit"], results[1]["edit"])
    assert results[0]["conf_sum"] == results[1]["conf_sum"]

    # and equal the single-process global value
    trials = [_trial(s) for s in range(6)]
    f1, ed, cf = F1Score(5), EditScore(5), ConfusionMatrix(5)
    for m in (f1, ed, cf):
        m.init_metric(len(trials))
    for y, p in trials:
        f1(y, p), ed(y, p), cf(y, p)
    for m in (f1, ed, cf):
        m.reduce()
    np.testing.assert_allclose(results[0]["f1"], f1.metric, rtol=1e-6)
    np.testing.assert_allclose(results[0]["edit"], ed.metric, rtol=1e-6)
    assert results[0]["conf_sum"] == int(cf.metric.sum())
    assert results[0]["conf_diag"] == int(np.trace(cf.metric))
