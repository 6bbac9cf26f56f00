"""Prediction / retrieval visualization.

Capability parity with the reference ``Visualizer``
(engine/procedure/visualizer.py:17-197):

- ``predict_images`` — per-image top-5 prediction annotation, optional CAM
  overlay side-by-side, pseudo-label txt dump (``labels/<stem>.txt``), and
  badcase sorting into ``bad_case/`` keyed on a target class.
- ``visualize_results`` — CBIR query / ground-truth / top-k retrieval grid
  with red TP outlines.

Host-side code; the only device work is the (jitted) forward / CAM passes.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Union

import numpy as np
from PIL import Image

from visiondk_tpu.data.datasets import read_image
from visiondk_tpu.utils.plots import Annotator


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max())
    return e / e.sum()


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


class Visualizer:
    @staticmethod
    def predict_images(
        forward: Callable[[np.ndarray], np.ndarray],
        dataset,
        visual_path: Union[str, Path],
        class_indices: Dict[int, str],
        logger,
        thresh: Union[float, List[float]] = 0,
        remove_label: bool = False,
        save_image: bool = True,
        badcase: bool = False,
        cam=None,
        target_class: Optional[str] = None,
    ) -> None:
        """``forward(input [1,H,W,3] f32/uint8) -> logits [C]``.

        ``dataset`` yields (raw PIL image, transformed array, path) triples —
        see PredictImageDatasets usage in visualize.py. ``thresh == 0`` means
        single-label (softmax); otherwise multilabel (sigmoid) with a scalar
        or per-class threshold vector (reference visualizer.py:33-57).
        """
        visual_path = Path(visual_path)
        visual_path.mkdir(parents=True, exist_ok=True)
        is_single_label = isinstance(thresh, (int, float)) and thresh == 0
        activation = _softmax if is_single_label else _sigmoid

        target_thresh = None
        if not is_single_label:
            if target_class is None:
                raise ValueError("multilabel badcase/thresholding needs --target_class")
            target_idx = None
            for idx, name in class_indices.items():
                if name == target_class:
                    target_idx = int(idx)
                    break
            if target_idx is None:
                raise ValueError(f"Target class {target_class} not found in class indices")
            target_thresh = (
                float(thresh[target_idx]) if isinstance(thresh, (list, tuple)) else float(thresh)
            )

        n = len(dataset)
        width = len(str(n))
        fixed = 15
        postfix_table: Dict[str, str] = {}

        for i in range(n):
            raw_img, inputs, img_path = dataset[i]
            pil_img = raw_img if isinstance(raw_img, Image.Image) else Image.fromarray(np.asarray(raw_img))

            x = np.asarray(inputs)[None]
            logits = np.asarray(forward(x)).squeeze()
            probs = activation(logits.astype(np.float64))
            top5i = np.argsort(-probs)[:5].tolist()

            lines = [f"{class_indices[j]:<{fixed}} {probs[j]:.2f}" for j in top5i]
            text = "\n".join(lines)
            flat = "      ".join(f"{class_indices[j]:<{fixed}}{probs[j]:.2f}" for j in top5i)
            logger.console(
                f"[{i + 1:>{width}}|{n:<{width}}] {os.path.basename(img_path):<20} {flat}"
            )

            if cam is not None:
                cam_image = cam(image=np.asarray(pil_img), input_tensor=x)

            if not remove_label:
                annotator = Annotator(pil_img)
                for line in lines:
                    annotator.text(line, color=(0, 0, 0))

            if remove_label or badcase:
                labels_dir = visual_path / "labels"
                labels_dir.mkdir(exist_ok=True)
                stem = os.path.splitext(os.path.basename(img_path))[0]
                postfix_table[stem + ".txt"] = os.path.splitext(img_path)[1]
                with open(labels_dir / (stem + ".txt"), "a") as f:
                    f.write(text + "\n")  # "<class> <prob>" per line

            if save_image:
                out = visual_path / os.path.basename(img_path)
                if cam is not None:
                    side = np.hstack([np.asarray(pil_img), cam_image])
                    Image.fromarray(side).save(out)
                else:
                    pil_img.save(out)

        if badcase:
            Visualizer._sort_badcases(
                visual_path, postfix_table, is_single_label, target_class, target_thresh
            )

    @staticmethod
    def _sort_badcases(
        visual_path: Path,
        postfix_table: Dict[str, str],
        is_single_label: bool,
        target_class: Optional[str],
        target_thresh: Optional[float],
    ) -> None:
        """Move images whose prediction misses ``target_class`` into
        ``bad_case/`` (reference visualizer.py:117-142)."""
        bad_dir = visual_path / "bad_case"
        bad_dir.mkdir(exist_ok=True)
        for txt in sorted((visual_path / "labels").glob("*.txt")):
            with open(txt) as f:
                lines = [ln for ln in f.read().splitlines() if ln.strip()]
            if is_single_label:
                is_bad = lines[0].split()[0] != target_class
            else:
                is_bad = True
                for line in lines:
                    name, prob = line.split()[0], float(line.split()[1])
                    if name == target_class and prob >= (target_thresh or 0.0):
                        is_bad = False
                        break
            if is_bad:
                img_name = txt.name.replace(".txt", postfix_table.get(txt.name, ""))
                src = visual_path / img_name
                if src.is_file():
                    shutil.move(str(src), str(bad_dir / img_name))

    @staticmethod
    def visualize_results(
        query: str,
        retrieval_results: Sequence[str],
        scores: Sequence[float],
        ground_truths: Sequence[str],
        savedir: Union[str, Path],
        max_rank: int = 5,
    ) -> Path:
        """Query / GT / top-k grid with red TP outlines
        (reference visualizer.py:144-197)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        savedir = Path(savedir)
        savedir.mkdir(parents=True, exist_ok=True)

        fig, axes = plt.subplots(2, max_rank + 1, figsize=(3 * (max_rank + 1), 12))
        for ax in axes.ravel():
            ax.set_axis_off()

        ax = fig.add_subplot(2, max_rank + 1, max_rank + 2)
        ax.imshow(read_image(query))
        ax.set_title("Query")
        ax.axis("off")

        for i in range(min(5, len(ground_truths))):
            ax = fig.add_subplot(2, max_rank + 1, i + 1)
            ax.imshow(read_image(ground_truths[i]))
            ax.set_title("Ground Truth")
            ax.axis("off")

        for i in range(min(max_rank, len(retrieval_results))):
            img = read_image(retrieval_results[i])
            is_tp = retrieval_results[i] in ground_truths
            ax = fig.add_subplot(2, max_rank + 1, (max_rank + 1) + i + 2)
            if is_tp:
                ax.add_patch(
                    plt.Rectangle(
                        xy=(0, 0), width=img.width - 1, height=img.height - 1,
                        edgecolor=(1, 0, 0), fill=False, linewidth=8,
                    )
                )
            ax.imshow(img)
            ax.set_title("{:.4f}/{}".format(float(scores[i]), "true" if is_tp else "false"))
            ax.axis("off")

        image_unique = (
            os.path.basename(os.path.dirname(query)) + "_" + os.path.basename(query)
        )
        out = savedir / image_unique
        fig.savefig(out)
        plt.close(fig)
        return out
