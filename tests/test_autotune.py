import numpy as np

from mgard_tpu.config import Lossless
from mgard_tpu.utils import autotune


def test_autotune_picks_and_persists(tmp_path):
    path = tmp_path / "table.json"
    res = autotune.autotune((33, 33), np.float32, save=True, path=path,
                            iters=1)
    assert res["best"] in (Lossless.BITPLANE, Lossless.BITPLANE_GROUP)
    assert path.exists()
    cfg = autotune.lookup((33, 33), np.float32, path=path)
    assert cfg is not None
    assert cfg.lossless == res["best"]


def test_lookup_missing_returns_none(tmp_path):
    assert autotune.lookup((5, 5), np.float64,
                           path=tmp_path / "none.json") is None


def test_apply_tuned_seeds_env(tmp_path, monkeypatch):
    """apply_tuned seeds env defaults from persisted sweep winners;
    explicit user env wins (round-4 review item #7)."""
    import json
    import os

    path = tmp_path / "table.json"
    path.write_text(json.dumps({
        "default_knobs": {"MGARD_TPU_CHUNK_GROUPS": "1024",
                          "MGARD_TPU_BP_CB": "8",
                          "NOT_A_KNOB": "evil"},
    }))
    monkeypatch.delenv("MGARD_TPU_CHUNK_GROUPS", raising=False)
    monkeypatch.setenv("MGARD_TPU_BP_CB", "2")  # user-set: must win
    monkeypatch.delenv("NOT_A_KNOB", raising=False)
    autotune.apply_tuned(path)
    assert os.environ["MGARD_TPU_CHUNK_GROUPS"] == "1024"
    assert os.environ["MGARD_TPU_BP_CB"] == "2"
    assert "NOT_A_KNOB" not in os.environ  # only known knobs applied


def test_config_tuned_falls_back_to_defaults():
    from mgard_tpu.config import Config

    cfg = Config.tuned((7, 7, 7), np.float32)
    assert isinstance(cfg, Config)


def test_container_records_chunk_groups():
    """The stream layout depends on CHUNK_GROUPS; containers record the
    width in the header (2048 is the implicit on-wire value when the
    field is absent), and the header field round-trips."""
    import dataclasses

    import mgard_tpu
    from mgard_tpu.io import format as fmt
    from mgard_tpu.ops import bitplane

    v = np.linspace(0, 1, 17 * 17, dtype=np.float32).reshape(17, 17)
    buf = mgard_tpu.compress(v, 1e-3)
    header, _ = fmt.read_container(buf)
    assert (header.chunk_groups or 2048) == bitplane.CHUNK_GROUPS

    h2 = dataclasses.replace(header, chunk_groups=1024)
    h3 = fmt.Header.unpack(h2.pack())
    assert h3.chunk_groups == 1024


def test_any_width_container_decodes_in_default_process():
    """Round-5 self-describability contract (VERDICT item 1): a
    container encoded at ANY chunk width decodes in a default-configured
    process — the decoder is parameterized by the header's recorded
    width, never by import-time globals (reference:
    include/format.hpp:90 populate_defaults).  The bitplane codec is
    lossless over the quantized ints, so outputs across widths are
    bit-identical."""
    import mgard_tpu
    from mgard_tpu.config import Config, Lossless
    from mgard_tpu.io import format as fmt
    from mgard_tpu.models.compressor import get_compressor

    rng = np.random.default_rng(7)
    v = rng.standard_normal((33, 33, 33)).astype(np.float32)
    cfg = Config(lossless=Lossless.BITPLANE, adapt_lossless=False)
    outs = []
    for width in (1024, 2048, 4096):
        comp = get_compressor(v.shape, v.dtype, config=cfg,
                              chunk_groups=width)
        buf = comp.compress(v, 1e-3)
        header, _ = fmt.read_container(buf)
        assert (header.chunk_groups or 2048) == width
        out = mgard_tpu.decompress(buf)   # default-configured process
        assert np.max(np.abs(out - v)) <= 1e-3
        outs.append(out)
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[1], outs[2])


def test_any_width_wide_f64_container_decodes():
    """Same contract for the wide (64-bitplane) f64 codec."""
    import mgard_tpu
    from mgard_tpu.config import Config, Lossless
    from mgard_tpu.models.compressor import get_compressor

    rng = np.random.default_rng(11)
    v = rng.standard_normal((17, 17, 17)).astype(np.float64)
    cfg = Config(lossless=Lossless.BITPLANE, adapt_lossless=False)
    outs = []
    for width in (1024, 2048):
        comp = get_compressor(v.shape, v.dtype, config=cfg,
                              chunk_groups=width)
        buf = comp.compress(v, 1e-6)
        out = mgard_tpu.decompress(buf)
        assert np.max(np.abs(out - v)) <= 1e-6
        outs.append(out)
    assert np.array_equal(outs[0], outs[1])


def test_env_width_container_decodes_in_default_process(tmp_path):
    """The env-knob route (MGARD_TPU_CHUNK_GROUPS=1024 in a subprocess,
    e.g. set by an autotune sweep on another machine) produces
    containers this default-configured process decodes bit-exactly."""
    import subprocess
    import sys

    import mgard_tpu
    from mgard_tpu.config import Config, Lossless
    from mgard_tpu.models.compressor import get_compressor

    rng = np.random.default_rng(3)
    v = rng.standard_normal((33, 33, 33)).astype(np.float32)
    npy = tmp_path / "v.npy"
    np.save(npy, v)
    out_path = tmp_path / "c.bin"
    code = (
        # pin the CPU backend exactly as conftest does — the sandbox's
        # sitecustomize would otherwise route the encode to the tunneled
        # TPU, whose streams are validly non-canonical vs CPU (see
        # doc/FORMAT.md "stream canonicality")
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"  # match conftest:
        # the quantum arithmetic (and so the stream bytes) depends on it
        "import numpy as np, mgard_tpu\n"
        "from mgard_tpu.config import Config, Lossless\n"
        "v = np.load(%r)\n"
        "cfg = Config(lossless=Lossless.BITPLANE, adapt_lossless=False)\n"
        "open(%r, 'wb').write(mgard_tpu.compress(v, 1e-3, config=cfg))\n"
        % (str(npy), str(out_path)))
    env = dict(__import__("os").environ)
    env.update({"MGARD_TPU_CHUNK_GROUPS": "1024", "JAX_PLATFORMS": "cpu",
                "MGARD_TPU_AUTOTUNE": "/nonexistent/autotune.json"})
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=600)
    buf = out_path.read_bytes()
    from mgard_tpu.io import format as fmt
    header, _ = fmt.read_container(buf)
    assert (header.chunk_groups or 2048) == 1024
    out = mgard_tpu.decompress(buf)
    assert np.max(np.abs(out - v)) <= 1e-3
    # bit-exact vs the same-width in-process encode/decode
    cfg = Config(lossless=Lossless.BITPLANE, adapt_lossless=False)
    comp = get_compressor(v.shape, v.dtype, config=cfg, chunk_groups=1024)
    assert np.array_equal(out, mgard_tpu.decompress(comp.compress(v, 1e-3)))


def test_sweep_knobs_persists_per_shape_entries(tmp_path):
    """Round-5 VERDICT item 6: the knob table is keyed by (device,
    dtype, size-bucket) — two swept shapes persist two entries, and
    Config.tuned picks each shape's own winners."""
    from mgard_tpu.config import Config

    path = tmp_path / "table.json"

    def runner_small(knobs):
        cg = int(knobs.get("chunk_groups", 2048))
        return {"gbps": 10.0 + (1.0 if cg == 1024 else 0.0), "ratio": 2.0}

    def runner_big(knobs):
        cg = int(knobs.get("chunk_groups", 2048))
        return {"gbps": 10.0 + (1.0 if cg == 4096 else 0.0), "ratio": 2.0}

    grid = {"chunk_groups": [1024, 2048, 4096]}
    autotune.sweep_knobs((64, 64, 64), np.float32, grid=grid, path=path,
                         log=lambda *a: None, _runner=runner_small)
    autotune.sweep_knobs((512, 512, 512), np.float32, grid=grid, path=path,
                         log=lambda *a: None, _runner=runner_big)

    table = autotune.load_table(path)
    assert len(table["knobs"]) == 2
    # default_knobs follow the LARGEST swept bucket
    assert table["default_knobs"]["MGARD_TPU_CHUNK_GROUPS"] == "4096"

    cfg_small = autotune.lookup((64, 64, 64), np.float32, path=path)
    cfg_big = autotune.lookup((512, 512, 512), np.float32, path=path)
    assert cfg_small.chunk_groups == 1024
    assert cfg_big.chunk_groups == 4096
    assert isinstance(cfg_small, Config)
