"""Data-prep tests: text-triplet parsing and split semantics (the
reference's prepare scripts, data/ml10M/prepare_ml10M_data.py)."""

import numpy as np
import pytest

from cumf_als_tpu.data.prepare import load_triplets, main, prepare


def test_load_triplets_mlstyle(tmp_path):
    p = tmp_path / "ratings.dat"
    p.write_text("1::122::5::838985046\n"
                 "1::185::3.5::838983525\n"
                 "2::122::4::838983392\n")
    users, items, ratings = load_triplets(str(p), "::")
    np.testing.assert_array_equal(users, [1, 1, 2])
    np.testing.assert_array_equal(items, [122, 185, 122])
    np.testing.assert_allclose(ratings, [5.0, 3.5, 4.0])


def test_prepare_split_and_onebased(tmp_path):
    rng = np.random.RandomState(0)
    users = rng.randint(1, 21, 200)
    items = rng.randint(1, 31, 200)
    ratings = rng.uniform(1, 5, 200).astype(np.float32)
    train, test = prepare(users.astype(np.int64),
                          items.astype(np.int64), ratings,
                          test_size=40)
    assert train.nnz == 160 and test.nnz == 40
    assert train.num_rows == users.max()  # 1-based -> 0-based
    assert train.indices.max() < train.num_cols
    # deterministic split (random_state=42 analog)
    train2, test2 = prepare(users.astype(np.int64),
                            items.astype(np.int64), ratings,
                            test_size=40)
    np.testing.assert_array_equal(test.row, test2.row)


def test_prepare_cli_text_input(tmp_path, capsys):
    p = tmp_path / "r.dat"
    lines = []
    rng = np.random.RandomState(1)
    for _ in range(120):
        lines.append(f"{rng.randint(1, 16)}::{rng.randint(1, 12)}::"
                     f"{rng.randint(1, 6)}")
    p.write_text("\n".join(lines))
    out = tmp_path / "ds"
    rc = main(["--input", str(p), "--sep", "::", "--test-size", "20",
               "--out", str(out)])
    assert rc == 0
    assert (out / "R_train_csr.data.bin").exists()
    assert "wrote" in capsys.readouterr().out
