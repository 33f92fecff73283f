import numpy as np
import jax.numpy as jnp

from pse_tpu import box as boxlib
from pse_tpu import neighbors as nb


def _brute_neighbors(pos, box, rcut):
    n = pos.shape[0]
    dr = np.asarray(boxlib.min_image(box, jnp.asarray(pos[:, None, :] - pos[None, :, :])))
    d = np.linalg.norm(dr, axis=-1)
    out = []
    for i in range(n):
        out.append(set(np.where((d[i] < rcut) & (np.arange(n) != i))[0].tolist()))
    return out


def _check_agreement(pos, box, spec):
    n = pos.shape[0]
    nlist, spec = nb.build_neighbor_list_auto(jnp.asarray(pos), box, spec)
    assert not bool(nlist.overflow)
    brute = _brute_neighbors(pos, box, spec.rcut)
    idx = np.asarray(nlist.idx)
    for i in range(n):
        mine = set(int(x) for x in idx[i] if x < n)
        assert mine == brute[i], f"particle {i}: {mine ^ brute[i]}"


def test_cell_list_matches_bruteforce_cubic():
    rng = np.random.default_rng(0)
    L = 20.0
    box = boxlib.make_box(L)
    pos = rng.uniform(-L / 2, L / 2, size=(300, 3)).astype(np.float32)
    spec = nb.make_spec(300, (L, L, L), rcut=3.0)
    assert not spec.all_pairs
    _check_agreement(pos, box, spec)


def test_cell_list_matches_bruteforce_tilted():
    rng = np.random.default_rng(1)
    L = (18.0, 22.0, 20.0)
    tilt = 0.45
    box = boxlib.make_box(L, tilt)
    # positions wrapped into the tilted box
    pos = rng.uniform(-15, 15, size=(256, 3)).astype(np.float32)
    pos, _ = boxlib.wrap(box, jnp.asarray(pos), jnp.zeros((256, 3), jnp.int32))
    pos = np.asarray(pos)
    spec = nb.make_spec(256, L, rcut=3.5, max_tilt=0.5)
    assert not spec.all_pairs
    _check_agreement(pos, box, spec)


def test_stencil_backend_matches_bruteforce():
    """subdiv=2 (nlist_type='stencil': rcut/2 cells, 125-stencil) finds the
    identical neighbor sets, cubic and tilted."""
    rng = np.random.default_rng(4)
    L = 20.0
    box = boxlib.make_box(L)
    pos = rng.uniform(-L / 2, L / 2, size=(300, 3)).astype(np.float32)
    spec = nb.make_spec(300, (L, L, L), rcut=3.0, subdiv=2)
    assert not spec.all_pairs and spec.subdiv == 2
    assert min(spec.n_cells) >= 5
    _check_agreement(pos, box, spec)

    Lt = (18.0, 22.0, 20.0)
    boxt = boxlib.make_box(Lt, 0.45)
    post = rng.uniform(-15, 15, size=(256, 3)).astype(np.float32)
    post, _ = boxlib.wrap(boxt, jnp.asarray(post), jnp.zeros((256, 3), jnp.int32))
    spect = nb.make_spec(256, Lt, rcut=3.5, max_tilt=0.5, subdiv=2)
    assert not spect.all_pairs and spect.subdiv == 2
    _check_agreement(np.asarray(post), boxt, spect)


def test_stencil_nlist_type_is_wired():
    """PSEv1(nlist_type='stencil') builds a subdiv=2 neighbor spec."""
    import warnings

    from pse_tpu.api import PSEv1

    with warnings.catch_warnings():
        warnings.simplefilter("error")      # must NOT warn (tree does)
        m = PSEv1(nlist_type="stencil")
    assert m.nlist_type == "stencil"


def test_all_pairs_small_box():
    rng = np.random.default_rng(2)
    L = 7.0  # too small for a 3x3x3 stencil at rcut=2.5
    box = boxlib.make_box(L)
    pos = rng.uniform(-L / 2, L / 2, size=(40, 3)).astype(np.float32)
    spec = nb.make_spec(40, (L, L, L), rcut=2.5)
    assert spec.all_pairs
    _check_agreement(pos, box, spec)


def test_overflow_flag_and_growth():
    rng = np.random.default_rng(3)
    L = 20.0
    box = boxlib.make_box(L)
    pos = rng.uniform(-L / 2, L / 2, size=(200, 3)).astype(np.float32)
    tight = nb.NeighborSpec(rcut=6.0, n_cells=(3, 3, 3), cell_capacity=4, max_neighbors=4)
    nlist = nb.build_neighbor_list(jnp.asarray(pos), box, tight)
    assert bool(nlist.overflow)
    nlist, spec = nb.build_neighbor_list_auto(jnp.asarray(pos), box, tight)
    assert not bool(nlist.overflow)
    assert spec.cell_capacity > tight.cell_capacity
