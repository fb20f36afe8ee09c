"""Public data surface mirroring the reference's ``src/data_module.py``.

``DoveDataModule`` keeps the reference ctor signature
(``src/data_module.py:10-19``) and the ``prepare_data/setup/print_info``
life-cycle; batch access is via ``train_batches/val_batches/test_volumes``
(JAX iterators) instead of torch DataLoaders.
"""

from __future__ import annotations

from unet_bssfp_tpu.data.datamodule import DoveDataModule, SampleSpec  # noqa: F401
from unet_bssfp_tpu.data.synthetic import make_synthetic_bids  # noqa: F401


def print_data_samples(data_dir: str, out_png: str = "augmentation.png"):
    """Visual smoke-check (reference ``print_data_samples``,
    ``src/data_module.py:205-231``): load one augmented batch, print shapes,
    save a slice montage."""
    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    data = DoveDataModule(data_dir)
    data.prepare_data()
    data.print_info()
    data.setup()
    batch = next(iter(data.train_batches(jax.random.PRNGKey(0))))
    print(list(batch.keys()))
    print(batch["pc-bssfp"].shape, batch["dwi-tensor_orig"].shape)
    k = batch["pc-bssfp"].shape[1] // 2
    fig, axes = plt.subplots(2, 2, figsize=(10, 10))
    panels = [
        ("pc-bssfp mag", np.asarray(batch["pc-bssfp"])[0, k, :, :, 0]),
        ("pc-bssfp phase", np.asarray(batch["pc-bssfp"])[0, k, :, :, 1]),
        ("dwi dxx", np.asarray(batch["dwi-tensor_orig"])[0, k, :, :, 0]),
        ("dwi dxy", np.asarray(batch["dwi-tensor_orig"])[0, k, :, :, 1]),
    ]
    for ax, (title, img) in zip(axes.ravel(), panels):
        ax.imshow(img, cmap="gray")
        ax.set_title(title)
        ax.axis("off")
    fig.savefig(out_png)
    plt.close(fig)
    return out_png


if __name__ == "__main__":
    import sys

    print_data_samples(sys.argv[1] if len(sys.argv) > 1 else ".")
