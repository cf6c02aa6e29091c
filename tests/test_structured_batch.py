import numpy as np

from fitclip_tpu.data.structured_batch import cat_collate, merge_datasets_batch


def test_cat_collate_pads_text_to_longest():
    a = {"video": np.ones((2, 3, 4, 4, 3), np.uint8),
         "text": np.ones((2, 5), np.int32), "video_id": ["a1", "a2"]}
    b = {"video": np.ones((3, 3, 4, 4, 3), np.uint8),
         "text": np.ones((3, 8), np.int32), "video_id": ["b1", "b2", "b3"]}
    merged, lengths = merge_datasets_batch({"x": a, "y": b})
    assert lengths == [2, 3]
    assert merged["video"].shape == (5, 3, 4, 4, 3)
    assert merged["text"].shape == (5, 8)
    assert merged["text"][0, 5:].sum() == 0  # padded tail of the short batch
    assert merged["video_id"] == ["a1", "a2", "b1", "b2", "b3"]


def test_cat_collate_scalar_arrays():
    merged = cat_collate([{"label": np.array([0, 1])}, {"label": np.array([2])}])
    np.testing.assert_array_equal(merged["label"], [0, 1, 2])
