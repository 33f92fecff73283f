"""GSD container round trip + integration with Simulation.run callbacks."""

import struct

import numpy as np

from pse_tpu.utils import gsd


def test_gsd_round_trip(tmp_path):
    path = str(tmp_path / "traj.gsd")
    rng = np.random.default_rng(0)
    L = (20.0, 22.0, 24.0)
    w = gsd.GSDWriter(path, L=L)
    frames = []
    for i in range(3):
        pos = rng.normal(size=(17, 3)).astype(np.float32)
        img = rng.integers(-2, 3, size=(17, 3)).astype(np.int32)
        frames.append((pos, img))
        w.append(pos, img, step=10 * i, tilt_xy=0.05 * i)
    w.close()

    d = gsd.read_gsd(path)
    assert d["pos"].shape == (3, 17, 3)
    assert np.array_equal(d["step"], [0, 10, 20])
    np.testing.assert_allclose(d["tilt_xy"], [0.0, 0.05, 0.1], atol=1e-7)
    for i, (pos, img) in enumerate(frames):
        np.testing.assert_array_equal(d["pos"][i], pos)
        np.testing.assert_array_equal(d["images"][i], img)
    np.testing.assert_allclose(d["box"][:3], L)

    # static chunks present in frame 0 and inherited by later frames
    assert int(gsd.read_chunk(path, 2, "particles/N")[0]) == 17
    tid = gsd.read_chunk(path, 1, "particles/typeid")
    assert tid.shape == (17,) and (tid == 0).all()


def test_gsd_header_layout(tmp_path):
    """Container fields land where gsd.h says (magic, versions, schema)."""
    path = str(tmp_path / "hdr.gsd")
    w = gsd.GSDWriter(path, L=10.0)
    w.append(np.zeros((4, 3), np.float32), step=0)
    w.close()
    raw = open(path, "rb").read(256)
    magic, index_loc, index_n, name_loc, name_n, schema_v, gsd_v = (
        struct.unpack("<QQQQQII", raw[:48])
    )
    assert magic == 0x65DF65DF65DF65DF
    assert gsd_v == (1 << 16)               # container 1.0
    # hoomd schema 1.0: the lowest version the emitted chunks require, so
    # readers from the reference envelope (gsd 1.5/1.6) accept the file
    assert schema_v == (1 << 16) | 0
    assert raw[48:48 + 64].rstrip(b"\0") == b"pse_tpu"
    assert raw[112:112 + 64].rstrip(b"\0") == b"hoomd"
    assert index_loc > 0 and name_loc > index_loc
    assert index_n >= 1 and name_n >= 1
    # index entries are 32 bytes, sorted by frame
    blob = open(path, "rb").read()
    entries = [struct.unpack("<QQqIHBB", blob[index_loc + 32 * i:
                                              index_loc + 32 * (i + 1)])
               for i in range(index_n)]
    assert all(e[2] >= 256 for e in entries)        # locations after header
    assert [e[0] for e in entries] == sorted(e[0] for e in entries)


def test_gsd_simulation_callback(tmp_path):
    import jax.numpy as jnp
    import pse_tpu as pse

    path = str(tmp_path / "sim.gsd")
    n, L = 64, 18.0
    rng = np.random.default_rng(1)
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    sim = pse.Simulation(pos, L=L, dt=1e-3, sync_every=2)
    sim.set_integrator(
        pse.PSEv1(T=0.5, seed=2, xi=0.5, error=1e-3),
        engine="gather", verbose=False,
    )
    w = gsd.GSDWriter(path, L=L)
    sim.run(4, callback=w)
    w.close()
    d = gsd.read_gsd(path)
    assert d["pos"].shape[0] == 2           # one frame per sync chunk
    assert d["pos"].shape[1] == n
    assert np.all(np.isfinite(d["pos"]))


def test_read_gsd_position_only(tmp_path):
    """Files without image chunks (append(pos) / external writers) load with
    images=None instead of crashing (ADVICE r2)."""
    from pse_tpu.utils.gsd import GSDWriter, read_gsd

    path = str(tmp_path / "posonly.gsd")
    w = GSDWriter(path, L=10.0)
    pos = np.arange(12, dtype=np.float32).reshape(4, 3)
    w.append(pos, step=0)
    w.append(pos + 1.0, step=1)
    w.close()
    d = read_gsd(path)
    assert d["images"] is None
    assert d["pos"].shape == (2, 4, 3)
    np.testing.assert_allclose(d["pos"][1], pos + 1.0)
