"""Driver-contract smoke tests for __graft_entry__.

The driver compile-checks `entry()` single-chip and runs
`dryrun_multichip(n)` with n virtual CPU devices; round 1's only red
contract light was this file (VERDICT.md "What's missing" #1), so both
functions are pinned here.  Slow: full-pipeline compiles on the 1-core
CPU host take minutes.
"""

import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def test_entry_compiles_and_runs():
    import jax

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    x_hat, bpp = jax.jit(fn)(*args)
    assert x_hat.shape == (1, 128, 128, 3)
    assert bpp.shape == ()
    assert float(bpp) > 0.0


def test_dryrun_multichip_subprocess():
    # run in a subprocess exactly as the driver does (fresh import, no
    # pre-forced platform): the function itself must force CPU + 8
    # virtual devices before JAX backend init.
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd="/root/repo", capture_output=True, text=True, timeout=2400,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
