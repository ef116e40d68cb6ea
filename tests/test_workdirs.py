"""Run-scoped scratch dirs: private per invocation, age-GC'd —
the ADVICE-r4 fix for fixed-dir races and uuid-dir leaks."""

import os
import time

from etl_mp_transactions_spark import workdirs


def test_run_dirs_are_private_and_fresh():
    a = workdirs.run_dir("t")
    b = workdirs.run_dir("t")
    assert a != b and os.path.isdir(a) and os.path.isdir(b)


def test_gc_sweeps_only_stale_dirs():
    live = workdirs.run_dir("gc")
    stale = workdirs.run_dir("gc")
    old = time.time() - workdirs._GC_AGE_S - 60
    os.utime(stale, (old, old))
    workdirs.run_dir("gc")  # any call triggers the sweep
    assert not os.path.exists(stale)
    assert os.path.exists(live)
