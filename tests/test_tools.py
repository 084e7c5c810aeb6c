"""Aux tools: layout, file lists, MNIST bank, video frames, analyzer, dedup CLI."""

import os

import numpy as np
import pytest

from dl4ss_tpu.data.layout_tools import generate_file_lists, layout_wsj0
from dl4ss_tpu.data.mnist import (digit_query_bank, load_mnist,
                                  synthetic_digits)
from dl4ss_tpu.data.video import load_frame_dir, load_video_bank
from dl4ss_tpu.data.wavio import write_wav
from dl4ss_tpu.run import analyze as analyze_cli
from dl4ss_tpu.run import evaluate as evaluate_cli


def test_layout_wsj0(tmp_path, rng):
    flat = tmp_path / "spk_all_wav"
    os.makedirs(flat)
    for spk in ["011", "022", "033"]:
        for u in range(2):
            write_wav(flat / f"{spk}a010{u}.wav",
                      0.1 * rng.standard_normal(800).astype(np.float32), 8000)
    counts = layout_wsj0(flat, tmp_path / "out",
                         {"train": ["011", "022"], "test": ["033"]})
    assert counts == {"train": 4, "test": 2}
    assert sorted(os.listdir(tmp_path / "out" / "data" / "train")) == \
        ["011", "022"]


def test_generate_file_lists(tmp_path, rng):
    for split, spks in [("train", ["s1", "s2"]), ("dev", ["s1", "s2"]),
                        ("test", ["s1", "s2"]), ("unk", ["u1", "u2"])]:
        for spk in spks:
            d = tmp_path / split / spk
            os.makedirs(d)
            for u in range(2):
                write_wav(d / f"{u}.wav",
                          0.1 * rng.standard_normal(500).astype(np.float32),
                          8000)
    lists = generate_file_lists(tmp_path, tmp_path / "lists", n_bg_test=3)
    train = open(lists["train"]).read().strip().splitlines()
    assert len(train) == 4 and train[0].split()[1] == "s1"
    test_rows = open(lists["test"]).read().strip().splitlines()
    cols = test_rows[0].split()
    assert len(cols) == 3 and len(cols[1].split(",")) == 2  # bg utts
    unk = open(lists["unk"]).read().strip().splitlines()
    # the reference's 4-column unk rows (gen_file_list.py:103-128):
    # tar bg unk supp1[,supp2...] — bg from OTHER unk speakers, speaker
    # column the literal 'unk', supplemental column the enrollment pool
    cols = unk[0].split()
    assert len(cols) == 4 and cols[2] == "unk"
    assert os.path.dirname(cols[0]) != os.path.dirname(cols[1])
    for supp in cols[3].split(","):
        assert os.path.dirname(supp) == os.path.dirname(cols[0])


def test_synthetic_mnist_and_bank():
    imgs, labels = synthetic_digits(4, seed=0)
    assert imgs.shape == (40, 28, 28) and set(labels.tolist()) == set(range(10))
    # distinct digit classes are distinguishable templates
    m0 = imgs[labels == 0].mean(axis=0)
    m1 = imgs[labels == 1].mean(axis=0)
    assert np.abs(m0 - m1).mean() > 0.02
    imgs2, labels2 = load_mnist(None, fallback_per_digit=4)
    bank = digit_query_bank(imgs2, labels2, num_speakers=12)
    assert bank.shape[0] == 12 and bank.shape[-1] == 1
    # speaker 11 -> digit 1 pool
    assert bank.shape[1] >= 1


def test_video_frame_loading(tmp_path):
    from PIL import Image
    d = tmp_path / "clip"
    os.makedirs(d)
    for i in range(3):
        Image.fromarray(
            (np.full((10, 12, 3), i * 40)).astype(np.uint8)).save(
            d / f"{i:03d}.png")
    frames = load_frame_dir(d, total_frames=5, size=(8, 8))
    assert frames.shape == (5, 8, 8, 3)
    # last frame repeated to fill T
    np.testing.assert_allclose(frames[2], frames[4])
    bank = load_video_bank([str(d)], 4, size=(8, 8))
    assert bank.shape == (1, 4, 8, 8, 3)


def test_analyze_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    coords = analyze_cli.main(["--preset", "synth_tiny", "--out",
                               str(tmp_path / "emb")])
    assert coords.shape[1] == 2
    assert os.path.exists(tmp_path / "emb.csv")


def test_evaluate_dedup_mode(tmp_path):
    sisdr = evaluate_cli.main(["--preset", "synth_tiny", "--batches", "1",
                               "--dedup"])
    assert np.isfinite(sisdr)
