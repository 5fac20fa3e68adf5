"""Multi-host rehearsal: a real 2-process ``jax.distributed`` CPU cluster
exercising ``parallel/distributed.py`` plus a shared-FS ``Ledger`` claim race
(the TPU-native analogue of the reference's 24-process filelock fan-out,
``run_stuff_linux.sh:3-6``)."""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import json, os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon

    from fiude_tpu.parallel import distributed
    from fiude_tpu.utils.ledger import Ledger
    from fiude_tpu.parallel.sweep import run_work_queue

    pid = int(sys.argv[1]); coord = sys.argv[2]; work = sys.argv[3]

    assert distributed.initialize(coordinator_address=coord,
                                  num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.process_index() == pid
    assert distributed.is_primary_host() == (pid == 0)

    # cross-host collective: every host sees host 0's value
    from jax.experimental import multihost_utils
    import numpy as np
    got = multihost_utils.broadcast_one_to_all(
        np.asarray([100.0 + pid], np.float32))
    assert float(got[0]) == 100.0, got

    # primary_only side effects land once
    @distributed.primary_only
    def write_marker():
        with open(os.path.join(work, "primary.txt"), "a") as fh:
            fh.write(f"host{pid}\\n")
        return "wrote"
    marker = write_marker()
    assert (marker == "wrote") == (pid == 0)

    # shared-FS ledger: both hosts race over the same 12 work units
    class C:
        def __init__(self, i): self.key = f"unit{i}"
    led = Ledger(os.path.join(work, "started.txt"))
    results = run_work_queue([C(i) for i in range(12)],
                             lambda c: {"host": pid, "key": c.key},
                             ledger=led)
    wins = [r["key"] for r in results if r]
    with open(os.path.join(work, f"wins_{pid}.json"), "w") as fh:
        json.dump(wins, fh)
    multihost_utils.sync_global_devices("done")
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the children steer the platform themselves; scrub any test forcing
    env.pop("XLA_FLAGS", None)

    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), coord, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    # primary_only wrote exactly once, from host 0
    with open(tmp_path / "primary.txt") as fh:
        assert fh.read() == "host0\n"

    # ledger race: every unit claimed exactly once across the two hosts
    import json
    wins0 = json.load(open(tmp_path / "wins_0.json"))
    wins1 = json.load(open(tmp_path / "wins_1.json"))
    assert set(wins0).isdisjoint(wins1)
    assert sorted(wins0 + wins1) == sorted(f"unit{i}" for i in range(12))

    # ledger records every unit finished
    with open(tmp_path / "started.txt") as fh:
        lines = fh.read().splitlines()
    assert len(lines) == 12
    assert all(line.endswith(" finished") for line in lines)
