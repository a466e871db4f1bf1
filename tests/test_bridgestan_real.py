"""End-to-end run against a REAL stanc-compiled BridgeStan model.

The image this repo is developed on has no Stan toolchain, so the Stan
path is normally exercised against hand-built BridgeStan-ABI densities
(csrc/abi_models.cpp). This test lights up the moment a real toolchain
is present: it pip-imports ``bridgestan``, compiles a minimal Stan
model with stanc, and runs ``walnuts_stan`` on the produced shared
object — the reference's own smoke test shape
(/root/reference/python/tests/test_stan.py:10-15, which compiles its
simple.stan). Skipped cleanly when bridgestan or the C++ toolchain is
unavailable.
"""

import textwrap

import numpy as np
import pytest

bridgestan = pytest.importorskip("bridgestan")

# a minimal own-authored model (std-normal location with one observed
# data point) — small enough that stanc+make finish in CI seconds
STAN_SRC = textwrap.dedent(
    """
    data {
      real y;
    }
    parameters {
      real mu;
    }
    model {
      mu ~ normal(0, 1);
      y ~ normal(mu, 1);
    }
    """
)


@pytest.fixture(scope="module")
def model_so(tmp_path_factory):
    d = tmp_path_factory.mktemp("bs")
    stan_file = d / "loc.stan"
    stan_file.write_text(STAN_SRC)
    try:
        return bridgestan.compile_model(str(stan_file))
    except Exception as e:  # no stanc / make / TBB on this machine
        pytest.skip(f"bridgestan present but compilation failed: {e!r}")


def test_walnuts_stan_on_real_model(model_so):
    from walnuts_tpu import walnuts_stan

    outputs = walnuts_stan(
        str(model_so),
        data='{"y": 1.0}',
        num_chains=2,
        seed=11,
        min_warmup_iter=150,
        max_warmup_iter=150,
        min_sampling_iter=300,
        max_sampling_iter=300,
        block_size=50,
    )
    assert len(outputs) == 2
    assert "mu" in outputs[0].parameters
    draws = np.concatenate([np.asarray(o["mu"]) for o in outputs])
    # posterior is N(0.5, 1/2): generous MC bounds
    assert abs(draws.mean() - 0.5) < 0.15
    assert abs(draws.std() - np.sqrt(0.5)) < 0.12
