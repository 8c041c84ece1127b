"""Worker-pool ConceptCap loader: bit-identical to the serial stream.

The reference fed the GPU from a 25-worker PrefetchDataZMQ fleet
(concept_cap_dataset.py:233) whose sample order was nondeterministic; here
per-sample RNGs are keyed by (seed, epoch, key index) so N threads produce
the SAME batches in the SAME order as one.
"""

import numpy as np

from vilbert_tpu.data.concap import ConceptCapLoader, ConceptCapSampleConfig
from vilbert_tpu.data.feature_store import InMemoryFeatureStore
from vilbert_tpu.data.tokenization import HashTokenizer


def make_loader(num_workers):
    store = InMemoryFeatureStore.synthetic(
        num_images=40, num_boxes=8, feature_dim=16, target_dim=7
    )
    captions = {k: f"a caption describing image {k} in words" for k in store.keys()}
    return ConceptCapLoader(
        store, captions, HashTokenizer(64),
        batch_size=8,
        cfg=ConceptCapSampleConfig(seq_len=12, region_len=8, feature_dim=16,
                                   target_dim=7),
        seed=3, num_workers=num_workers,
    )


def test_parallel_matches_serial_across_epochs():
    serial, parallel = make_loader(0), make_loader(4)
    for epoch in range(2):
        for b_ser, b_par in zip(serial, parallel):
            assert set(b_ser) == set(b_par)
            for k in b_ser:
                np.testing.assert_array_equal(b_ser[k], b_par[k], err_msg=k)


def test_token_cache_transparent():
    l1, l2 = make_loader(0), make_loader(0)
    l2.preprocessor._token_cache_size = 0  # cache disabled
    for b1, b2 in zip(l1, l2):
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)
    assert len(l1.preprocessor._token_cache) > 0
    assert len(l2.preprocessor._token_cache) == 0
