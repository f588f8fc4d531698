"""Raw-format loader tests on checked-in fixtures (VERDICT.md r2 item 2).

The reference snapshot is missing its ratings.dat blob and all seven
sibling loaders, so until now no loader had ever parsed a real-format
file.  tests/fixtures/ holds tiny synthetic files in each raw format:

  * ml-1m/movies.dat + ratings.dat — '::'-separated, latin-1 titles,
    exactly the format of `/root/reference/DataHandle/
    get_origin_data_ml.py:16-18` (the surviving movies.dat confirms it);
  * orgin_data/{yoochoose,tmall,taobaoapp,amazon_*}.csv — the
    canonicalized-CSV contract of the snapshot-absent loader family
    (data/ingest._csv_loader; SURVEY.md "snapshot gaps").

Every loader code path executes here, including the min-activity filter,
the 80% user sample, the cache write/read, and an end-to-end train on
the ml-1m fixture.
"""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from mtamrecommender_tpu.config import DataConfig, ExperimentConfig
from mtamrecommender_tpu.data.ingest import load_ml_1m, load_origin_data

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _ml1m_root(tmp_path, frac=1.0, **kw):
    root = tmp_path / "data"
    (root / "raw_data").mkdir(parents=True)
    shutil.copytree(os.path.join(FIXTURES, "ml-1m"),
                    str(root / "raw_data" / "ml-1m"))
    return DataConfig(dataset="ml_1m", data_root=str(root),
                      user_sample_frac=frac, **kw)


def test_ml1m_loader_parses_real_format(tmp_path):
    cfg = _ml1m_root(tmp_path, frac=1.0)
    df = load_ml_1m(cfg)
    # canonical schema (get_origin_data_ml.py:33-39)
    assert list(df.columns) == ["user_id", "item_id", "time_stamp", "cat_id"]
    # fixture golden: items {103,106,109,112} have 4 ratings -> dropped by
    # the 5-activity floor; all 8 users keep >=5 events
    assert sorted(df.item_id.unique()) == [101, 102, 104, 105, 107, 108,
                                           110, 111]
    assert len(df) == 48
    assert sorted(df.user_id.unique()) == list(range(1, 9))
    # cat_id is the genres string joined from movies.dat
    assert set(df[df.item_id == 101].cat_id) == {"Animation|Children's|Comedy"}
    assert set(df[df.item_id == 104].cat_id) == {"Drama"}
    # timestamps survive the merge untouched
    row = df[(df.user_id == 1) & (df.item_id == 104)].iloc[0]
    assert row.time_stamp == 978350000
    # latin-1 title in movies.dat must not break the parse (item 103 is
    # dropped by the filter but was decoded during the merge)


def test_ml1m_loader_user_sampling(tmp_path):
    # low activity floor so the 6-user sample itself is observable
    # (get_origin_data_ml.py:27-29 samples BEFORE filtering)
    cfg = _ml1m_root(tmp_path, frac=0.8, min_user_actions=1,
                     min_item_actions=1)
    df = load_ml_1m(cfg)
    # sample(frac=.8) of 8 users -> exactly 6 users
    assert df.user_id.nunique() == 6
    assert len(df) == 48
    # seeded: identical on a rerun from the raw files
    cfg2 = _ml1m_root(tmp_path / "again", frac=0.8, min_user_actions=1,
                      min_item_actions=1)
    assert df.equals(load_ml_1m(cfg2))


def test_ml1m_loader_cache_roundtrip(tmp_path):
    cfg = _ml1m_root(tmp_path)
    df = load_ml_1m(cfg)
    cache = os.path.join(cfg.data_root, "orgin_data", "movielens.csv")
    assert os.path.exists(cache)
    # second call reads the cache (delete raw files to prove it)
    shutil.rmtree(os.path.join(cfg.data_root, "raw_data"))
    df2 = load_ml_1m(cfg)
    pd.testing.assert_frame_equal(df, df2)


@pytest.mark.parametrize("dataset,filename", [
    ("yoochoose", "yoochoose.csv"), ("tmall", "tmall.csv"),
    ("taobaoapp", "taobaoapp.csv"), ("music", "amazon_music.csv"),
    ("beauty", "amazon_beauty.csv"), ("elec", "amazon_elec.csv")])
def test_csv_loader_family(dataset, filename, tmp_path):
    root = tmp_path / "data"
    (root / "orgin_data").mkdir(parents=True)
    shutil.copy(os.path.join(FIXTURES, "orgin_data", filename),
                str(root / "orgin_data" / filename))
    cfg = DataConfig(dataset=dataset, data_root=str(root))
    df = load_origin_data(cfg)
    assert list(df.columns) == ["user_id", "item_id", "time_stamp", "cat_id"]
    # fixture golden: item 10 has 6 events, the rest 7; all survive the
    # floor, so the full 48 rows come through
    assert len(df) == 48
    assert df.user_id.nunique() == 6 and df.item_id.nunique() == 7
    assert set(df.cat_id.unique()) == {"c0", "c1", "c2"}


def test_csv_loader_missing_file_raises(tmp_path):
    cfg = DataConfig(dataset="yoochoose", data_root=str(tmp_path))
    with pytest.raises(FileNotFoundError):
        load_origin_data(cfg)


def test_csv_loader_missing_columns_raises(tmp_path):
    (tmp_path / "orgin_data").mkdir(parents=True)
    (tmp_path / "orgin_data" / "tmall.csv").write_text(
        "user_id,item_id\n1,2\n")
    cfg = DataConfig(dataset="tmall", data_root=str(tmp_path))
    with pytest.raises(ValueError, match="missing canonical columns"):
        load_origin_data(cfg)


def test_end_to_end_train_on_ml1m_fixture(tmp_path):
    """The full reference flow on the real-format fixture: raw .dat parse
    -> canonical frame -> example builder -> packed batches -> a few
    optimizer steps -> eval (VERDICT.md item 2 'Done =' condition)."""
    from mtamrecommender_tpu.data.pipeline import pack_examples
    from mtamrecommender_tpu.data.prepare import prepare_examples
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.train.trainer import Trainer

    cfg_data = _ml1m_root(tmp_path)
    origin = load_ml_1m(cfg_data)
    cfg = ExperimentConfig().with_overrides(**{
        "data.dataset": "ml_1m", "data.data_root": cfg_data.data_root,
        "data.max_seq_len": 8, "data.min_user_actions": 2,
        "data.min_item_actions": 2,
        "model.experiment_type": "MTAM", "model.num_units": 16,
        "model.num_blocks": 2, "model.dropout": 0.1,
        "train.train_batch_size": 16, "train.test_batch_size": 16,
        "train.eval_freq": 1000, "train.display_freq": 1000})
    prepared = prepare_examples(origin, cfg.data)
    assert len(prepared.train_set) > 0 and len(prepared.test_set) > 0
    train = pack_examples(prepared.train_set, prepared.meta)
    test = pack_examples(prepared.test_set, prepared.meta)
    trainer = Trainer(cfg=cfg, model=get_model("MTAM"), train_data=train,
                      test_data=test, run_dir=str(tmp_path / "run"))
    state = trainer.fit(max_epochs=5, max_steps=10)
    assert 0 < state.step <= 10
    m = trainer.evaluate(state)
    assert np.isfinite(m["hr@10"]) and 0.0 <= m["hr@10"] <= 1.0
