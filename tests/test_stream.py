"""Streamed (beyond-host-RAM) ingest: block iterator + device assembly
must bit-match the in-memory path, through to CLI-level outputs."""

import numpy as np
import pytest

from conftest import BREEDING_BEAGLE, BREEDING_IDS, GOLDEN_DIR

from wgsassign_tpu.io.beagle import read_beagle
from wgsassign_tpu.io.stream import open_block_iterator
from wgsassign_tpu.models.common import stream_to_device, to_device
from wgsassign_tpu.parallel.mesh import make_runtime


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("block_rows", [64, 10_000])
def test_block_iterator_matches_full_parse(use_native, block_rows):
    full = read_beagle(str(BREEDING_BEAGLE))
    meta, blocks = open_block_iterator(
        str(BREEDING_BEAGLE), block_rows, use_native=use_native
    )
    assert (meta.n_sites, meta.n_inds) == (full.n_sites, full.n_inds)
    assert meta.sample_names == full.sample_names
    lo, sites = 0, []
    for gl, names in blocks:
        assert gl.shape[0] <= block_rows
        np.testing.assert_array_equal(gl, full.gl[lo : lo + gl.shape[0]])
        sites.extend(names)
        lo += gl.shape[0]
    assert lo == full.n_sites
    assert sites == full.site_names


@pytest.mark.parametrize("use_native", [True, False])
def test_streamed_cohort_bitmatches_in_memory(use_native):
    rt = make_runtime()
    full = to_device(read_beagle(str(BREEDING_BEAGLE)), rt)
    cohort, meta, names = stream_to_device(
        str(BREEDING_BEAGLE), rt, block_rows=64, use_native=use_native,
        collect_site_names=True,
    )
    assert cohort.m_real == full.m_real
    np.testing.assert_array_equal(np.asarray(cohort.g0), np.asarray(full.g0))
    np.testing.assert_array_equal(np.asarray(cohort.g1), np.asarray(full.g1))
    np.testing.assert_array_equal(
        np.asarray(cohort.site_weight), np.asarray(full.site_weight)
    )
    assert names == read_beagle(str(BREEDING_BEAGLE)).site_names


def test_streamed_cli_reference_af_and_loo(tmp_path):
    """Full --get_reference_af --loo via --stream_ingest matches goldens."""
    from wgsassign_tpu.cli import main

    out = tmp_path / "run"
    main([
        "-o", str(out),
        "--beagle", str(BREEDING_BEAGLE),
        "--pop_af_IDs", str(BREEDING_IDS),
        "--get_reference_af", "--loo",
        "--stream_ingest", "64",
    ])
    golden = np.load(GOLDEN_DIR / "ref_af.npz", allow_pickle=True)
    np.testing.assert_allclose(
        np.load(str(out) + ".pop_af.npy"), golden["af"], atol=2e-5
    )
    import pandas as pd

    loo_golden = np.load(GOLDEN_DIR / "loo.npz")
    df = pd.read_csv(str(out) + ".pop_like_LOO.tsv", sep="\t")
    np.testing.assert_allclose(
        df.iloc[:, 2:].to_numpy(), loo_golden["ll"], rtol=2e-4, atol=2e-3
    )


def test_streamed_cli_zscore_matches_golden(tmp_path):
    """z-scores under --stream_ingest: the per-individual GL columns are
    gathered back from the device cohort (the GL matrix never exists on
    host), and the result matches the host-parsed golden (VERDICT r2
    carve-out lifted)."""
    import numpy as np

    from wgsassign_tpu.cli import main

    golden = np.load(GOLDEN_DIR / "zscore_reference.npz")
    out = tmp_path / "run"
    main([
        "-o", str(out),
        "--beagle", str(BREEDING_BEAGLE),
        "--pop_af_IDs", str(BREEDING_IDS),
        "--pop_names", str(BREEDING_IDS),
        "--ind_ad_file", str(GOLDEN_DIR / "breeding_ad.txt.gz"),
        "--allele_count_threshold", str(int(golden["threshold"])),
        "--get_reference_z_score",
        "--ind_start", "0", "--ind_end", "4",
        "--stream_ingest", "64",
    ])
    z = np.loadtxt(str(out) + ".reference_z_ind.txt")
    np.testing.assert_allclose(z, golden["z"][:4], rtol=2e-3, atol=2e-3)


def test_streamed_cli_downsampled_loo_matches_golden(tmp_path):
    """--loo_downsampled_beagle under --stream_ingest: the site
    intersection comes from a name-scan pass and both GL matrices stream
    to device masked — outputs match the host-parsed golden (the last
    streamed-mode carve-out, lifted)."""
    import gzip

    import numpy as np
    import pandas as pd

    from conftest import BREEDING_SUBSET_BEAGLE
    from wgsassign_tpu.cli import main

    golden = np.load(GOLDEN_DIR / "loo_downsampled.npz")
    out = tmp_path / "run"
    main([
        "-o", str(out),
        "--beagle", str(BREEDING_BEAGLE),
        "--pop_af_IDs", str(BREEDING_IDS),
        "--loo_downsampled_beagle", str(BREEDING_SUBSET_BEAGLE),
        "--get_reference_af", "--loo", "--partition_sites", "4",
        "--stream_ingest", "64",
    ])
    df = pd.read_csv(str(out) + ".pop_like_LOO_downsampled.tsv", sep="\t")
    np.testing.assert_allclose(
        df.iloc[:, 2:].to_numpy(), golden["ll"], rtol=1e-5, atol=2e-3
    )
    partfile = str(out) + ".pop_like_LOO_downsampled_partitions_4.tsv.gz"
    with gzip.open(partfile, "rt") as f:
        dfp = pd.read_csv(f, sep="\t")
    assert len(dfp) == 85 * 4
    np.testing.assert_allclose(
        dfp.iloc[:, 3:].to_numpy(), golden["parts"], rtol=1e-4, atol=2e-3
    )


def test_python_fallback_row_window_skips_blank_lines(tmp_path):
    """Row-window offsets are in data-row space everywhere (the native
    skip and beagle_dims ignore whitespace-only lines); the python
    fallback must count the same way, not raw lines (round-4 review
    finding: pandas skiprows counts raw lines)."""
    import gzip

    import numpy as np

    from wgsassign_tpu.io.stream import open_block_iterator

    path = tmp_path / "blank.beagle.gz"
    header = "marker\tallele1\tallele2\tI0\tI0\tI0\n"
    rows = [
        f"s{i}\t0\t1\t{0.1 + i / 100:.2f}\t0.5\t{0.4 - i / 100:.2f}\n"
        for i in range(8)
    ]
    with gzip.open(path, "wt") as f:
        f.write(header)
        f.write(rows[0])
        f.write("\n")          # blank line inside the data
        f.write("".join(rows[1:4]))
        f.write("\n")
        f.write("".join(rows[4:]))
    meta, blocks = open_block_iterator(
        str(path), 3, use_native=False, row_range=(2, 6)
    )
    names = [nm for _, nms in blocks for nm in nms]
    assert names == ["s2", "s3", "s4", "s5"]
    # and the full parse agrees with the native data-row semantics
    meta2, blocks2 = open_block_iterator(str(path), 100, use_native=False)
    assert sum(b[0].shape[0] for b in blocks2) == 8
