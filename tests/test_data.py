import numpy as np
import pytest

from isp_tts_tpu.config import build_config
from isp_tts_tpu.data import AcousticCollator, AcousticDataset, DataLoader, TTSMeta
from isp_tts_tpu.data.audio import load_audio, write_wav
from isp_tts_tpu.data.dataset import AcousticDatasetConfig
from isp_tts_tpu.data.text import CodingTable, punct_corrector

SR = 22050


# ---------------------------------------------------------------------------
# text front-end
# ---------------------------------------------------------------------------

def test_coding_table_from_charset_macros():
    ct = CodingTable.from_charset(["<pad>", "</s>", "#punct", "#en"])
    assert ct.encode("<pad>") == 0  # pad is id 0
    assert ct.encode("</s>") == 1
    assert "a" in ct and "z" in ct and "." in ct
    vec = ct.text_to_vector(ct.check_eos("ab."))
    assert vec[-1] == ct.encode("</s>")
    assert ct.vector_to_text(vec) == "ab.</s>"


def test_coding_table_unknown_chars_dropped():
    ct = CodingTable.from_charset(["<pad>", "#en"])
    vec = ct.text_to_vector("aXb✓")
    assert ct.vector_to_text(vec) == "ab"


def test_punct_corrector():
    assert punct_corrector("  «Hello»  [world] … ") == '"Hello" world ...'
    assert punct_corrector("?!hello") == "hello"
    assert punct_corrector("end , .") == "end."


# ---------------------------------------------------------------------------
# synthetic dataset fixture
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("toyds")
    (root / "wavs").mkdir()
    rng = np.random.RandomState(0)
    texts = ["hello world.", "a be sea!", "the quick brown fox?",
             "pad me up.", "five is alive,", "six mix."]
    lines = []
    for i, text in enumerate(texts):
        dur = 0.35 + 0.12 * i
        n = int(SR * dur)
        t = np.arange(n) / SR
        f0 = 120 + 30 * i
        wav = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.randn(n)
        write_wav(root / "wavs" / f"utt{i}.wav", wav.astype(np.float32), SR)
        lines.append(f"wavs/utt{i}.wav|{text}|spk{i % 2}")
    (root / "meta.csv").write_text("\n".join(lines) + "\n")
    return root


def _dataset(root, **over):
    cfg = build_config(AcousticDatasetConfig, dict({
        "root": str(root),
        "meta_name": "meta.csv",
        "meta_column_names": ("audio_path", "text", "speaker"),
        "text": {"charset": ["<pad>", "</s>", "#punct", "#en"]},
        "audio": {"sample_rate": SR},
        "spec": {"n_fft": 1024, "hop_length": 256, "win_length": 1024},
        "mel_scale": {"sample_rate": SR, "n_mels": 80},
        "pitch": {"sample_rate": SR},
        "energy": {},
        "speaker": {"spk0": 0, "spk1": 1},
    }, **over))
    return AcousticDataset(cfg)


def test_wav_roundtrip(tmp_path):
    x = (0.3 * np.sin(np.linspace(0, 100, 4000))).astype(np.float32)
    write_wav(tmp_path / "x.wav", x, SR)
    y = load_audio(tmp_path / "x.wav", SR)
    np.testing.assert_allclose(x, y, atol=2e-4)


def test_inject_data_config_embeds_audio_geometry(toy_dataset):
    """Checkpoints are self-describing for waveform inversion: the mel/audio
    geometry (sample rate, STFT frame, mel band edges) rides along in the
    model config so serving never has to guess it."""
    from isp_tts_tpu.models.acoustic.model import AcousticModel

    ds = _dataset(toy_dataset)
    cfg = AcousticModel.inject_data_config({}, ds)
    assert cfg["audio_config"] == {
        "sample_rate": SR, "n_fft": 1024, "hop_length": 256,
        "win_length": 1024, "f_min": 0.0, "f_max": 8000.0,
    }


def test_dataset_sample(toy_dataset):
    ds = _dataset(toy_dataset)
    assert len(ds) == 6
    s = ds[0]
    assert s.mel.shape[1] == 80 and s.mel.shape[0] == s.mel_len
    assert s.pitch.shape == (s.mel_len,)
    assert s.energy.shape == (s.mel_len,)
    assert s.speaker == 0 and ds[1].speaker == 1
    assert s.text_vector[-1] == 1  # EOS id
    assert np.isfinite(s.mel).all()


def test_dataset_stats_and_standardization(toy_dataset):
    ds = _dataset(toy_dataset)
    stats = ds.compute_stats(save_stats=True)
    assert 100 < stats.pitch.mean < 350  # tones at 120..270 Hz
    assert stats.pitch.std > 0
    assert (toy_dataset / "stats.json").exists()
    # pitch is now standardized with the stats
    s = ds[0]
    voiced = s.pitch[np.abs(s.pitch) > 1e-9]
    assert np.abs(np.median(voiced)) < 4.0


def test_dataset_length_filters(toy_dataset):
    ds = _dataset(toy_dataset, text_length_limits=(0, 12))
    assert len(ds) < 6
    ds2 = _dataset(toy_dataset, audio_length_limits=(0.0, 0.5))
    assert len(ds2) < 6


def test_collator_bucketing(toy_dataset):
    ds = _dataset(toy_dataset)
    coll = AcousticCollator(text_pad_multiple=16, mel_pad_multiple=64)
    batch = coll([ds[i] for i in range(4)])
    B, T = batch["text_vector"].shape
    _, M, n_mels = batch["mel"].shape
    assert B == 4 and T % 16 == 0 and M % 64 == 0 and n_mels == 80
    assert batch["pitch"].shape == (4, M)
    assert batch["speaker"].tolist() == [0, 1, 0, 1]
    # padding is zero beyond each mel_len
    for i in range(4):
        assert batch["mel"][i, batch["mel_len"][i]:].sum() == 0


def test_dataloader_sharding(toy_dataset):
    ds = _dataset(toy_dataset)
    coll = AcousticCollator()
    dl = DataLoader(ds, coll, batch_size=4, shuffle=True, seed=1)
    batches = list(dl)
    assert len(batches) == 1 and batches[0]["mel"].shape[0] == 4

    # two shards each see half of every batch
    dl0 = DataLoader(ds, coll, batch_size=4, num_shards=2, shard_index=0)
    dl1 = DataLoader(ds, coll, batch_size=4, num_shards=2, shard_index=1)
    b0, b1 = next(iter(dl0)), next(iter(dl1))
    assert b0["mel"].shape[0] == 2 and b1["mel"].shape[0] == 2
    assert set(b0["filename"]).isdisjoint(b1["filename"])

    # shards are CONTIGUOUS slices: concatenating them in process order
    # reproduces the 1-process batch order exactly (so per-position RNG —
    # flow-matching noise, dropout — matches across process counts)
    dl_all = DataLoader(ds, coll, batch_size=4)
    b_all = next(iter(dl_all))
    assert list(b0["filename"]) + list(b1["filename"]) == list(b_all["filename"])


def test_meta_split():
    from isp_tts_tpu.data.metadata import MetaRecord, TTSMeta

    meta = TTSMeta([MetaRecord(f"wavs/u{i}.wav", f"text {i}") for i in range(20)])
    train, valid = meta.split(ratio=0.1, seed=42)
    assert len(valid) == 2 and len(train) == 18
    # deterministic
    train2, valid2 = meta.split(ratio=0.1, seed=42)
    assert [r.audio_path for r in valid] == [r.audio_path for r in valid2]
    # disjoint
    assert {r.audio_path for r in train}.isdisjoint({r.audio_path for r in valid})


def test_dataloader_prefetch_matches_sync(toy_dataset):
    ds = _dataset(toy_dataset)
    coll = AcousticCollator()
    sync = list(DataLoader(ds, coll, batch_size=2, shuffle=True, seed=3, prefetch=0))
    pre = list(DataLoader(ds, coll, batch_size=2, shuffle=True, seed=3, prefetch=2))
    assert len(sync) == len(pre) == 3
    for a, b in zip(sync, pre):
        assert a["filename"] == b["filename"]
        np.testing.assert_array_equal(a["text_vector"], b["text_vector"])


def test_dataloader_droplast_false_pads_shards(toy_dataset):
    """Final partial batch cycles indices so every shard keeps equal size."""
    ds = _dataset(toy_dataset)  # 6 samples
    coll = AcousticCollator()
    dl0 = DataLoader(ds, coll, batch_size=4, drop_last=False,
                     num_shards=2, shard_index=0, prefetch=0)
    dl1 = DataLoader(ds, coll, batch_size=4, drop_last=False,
                     num_shards=2, shard_index=1, prefetch=0)
    b0, b1 = list(dl0), list(dl1)
    assert len(b0) == len(b1) == 2
    # final partial batch (2 leftover samples) still yields equal local sizes
    assert b0[-1]["mel"].shape[0] == b1[-1]["mel"].shape[0] == 1


def test_feature_cache_bounds():
    from isp_tts_tpu.data.dataset import AcousticSample, FeatureCache

    def sample(i, frames=10):
        return AcousticSample(
            filename=f"u{i}", text="t", text_vector=np.zeros(4, np.int32),
            text_vector_len=4, mel=np.zeros((frames, 80), np.float32),
            mel_len=frames)

    cache = FeatureCache(max_items=3)
    for i in range(5):
        cache.put(i, sample(i))
    assert len(cache) == 3 and 0 not in cache and 4 in cache

    one = sample(0).mel.nbytes + 16  # mel + text_vector
    cache = FeatureCache(max_bytes=2.5 * one)
    for i in range(4):
        cache.put(i, sample(i))
    assert len(cache) == 2 and cache.nbytes <= 2.5 * one
    # touching an entry protects it from LRU eviction
    cache.get(2)
    cache.put(9, sample(9))
    assert 2 in cache and 3 not in cache


def test_batched_frontend_matches_per_utterance(toy_dataset):
    ds_ref = _dataset(toy_dataset, stats={"pitch": {"mean": 150.0, "std": 40.0},
                                          "energy": {"mean": 0.0, "std": 1.0}})
    ds_bat = _dataset(toy_dataset, batched_frontend=True,
                      stats={"pitch": {"mean": 150.0, "std": 40.0},
                             "energy": {"mean": 0.0, "std": 1.0}})
    assert ds_bat._frontend_cfg is not None
    batch = ds_bat.get_batch([0, 2, 4])
    for sample, i in zip(batch, [0, 2, 4]):
        ref = ds_ref[i]
        assert sample.mel_len == ref.mel_len
        np.testing.assert_allclose(sample.mel, ref.mel, atol=2e-4)
        np.testing.assert_allclose(sample.pitch, ref.pitch, atol=2e-3)
        np.testing.assert_allclose(sample.energy, ref.energy, atol=2e-4)
        assert sample.speaker == ref.speaker
    # second call is served from the cache (no re-extraction)
    assert all(i in ds_bat._cache for i in [0, 2, 4])
    again = ds_bat.get_batch([0, 2, 4])
    np.testing.assert_array_equal(again[1].mel, batch[1].mel)


def test_batched_frontend_through_loader(toy_dataset):
    from isp_tts_tpu.data.collator import AcousticCollator, AcousticCollatorConfig
    from isp_tts_tpu.data.loader import DataLoader

    ds = _dataset(toy_dataset, batched_frontend=True,
                  stats={"pitch": {"mean": 150.0, "std": 40.0},
                         "energy": {"mean": 0.0, "std": 1.0}})
    collator = AcousticCollator(build_config(AcousticCollatorConfig, {}))
    loader = DataLoader(ds, collator, batch_size=3, shuffle=False, prefetch=0)
    batches = list(loader)
    assert len(batches) == 2
    assert np.isfinite(batches[0]["mel"]).all()


def test_loader_propagates_producer_exceptions():
    """A crash inside the prefetch producer (bad file, broken feature) must
    fail the epoch, not silently truncate it to the batches produced before
    the crash (found live by the joint fine-tune run, round 4)."""
    import pytest

    from isp_tts_tpu.data.loader import DataLoader

    class Exploding:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i >= 4:
                raise OSError(f"bad sample {i}")
            return i

    loader = DataLoader(Exploding(), collate_fn=list, batch_size=2,
                        shuffle=False, drop_last=True)
    seen = []
    with pytest.raises(OSError, match="bad sample"):
        for batch in loader:
            seen.append(batch)
    assert len(seen) == 2  # the good batches arrived before the failure
