"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np

import __graft_entry__ as graft
from gencore_tpu.core import kernels
from gencore_tpu.options import Options
from gencore_tpu.parallel import mesh as pmesh


def test_entry_compiles():
    import jax
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == args[0][:, 0, :].shape


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


def test_sharded_consensus_matches_single_device():
    import jax
    opt = Options()
    J, K, L = 16, 4, 128
    batch = graft._example_vote_batch(J, K, L, seed=5)
    mesh = pmesh.make_mesh(8)
    out_sharded = pmesh.sharded_consensus_step(mesh, *batch, opt)
    rnum, rden = kernels.ratio_fraction(opt.score_percent_req)
    out_single = kernels.consensus_kernel(
        *[np.asarray(a) for a in batch], hi=opt.high_quality,
        mod=opt.moderate_quality, lo=opt.low_quality,
        base_score_req=opt.base_score_req, ratio_num=rnum, ratio_den=rden)
    for a, b in zip(out_sharded[:4], out_single):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_stats_psum():
    mesh = pmesh.make_mesh(8)
    partials = np.arange(8 * 5, dtype=np.int64).reshape(8, 5)
    total = np.asarray(pmesh.stats_psum(mesh, partials))
    assert (total == partials.sum(axis=0)).all()
