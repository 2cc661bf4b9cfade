"""Foundation-model zero-shot baseline: GroundingDINO boxes → SAM masks.

Reference: FoundationModel/two_stage_foundation.py — zero-shot detection with
prompts ["a cat", "a dog"] (box thresh 0.3, text 0.25), boxes prompt
SAM-vit-base, ``pred_masks[:, 0]`` → channel-max > 0.5 → 224² NEAREST binary
mask; eval vs trimap∈{1,3}; saves masks + 3-panel viz.

Design: the pipeline is dependency-injected — ``detector(image, prompts) →
boxes [N,4]`` and ``segmenter(image, boxes) → masks [N,H,W] float`` — so the
orchestration, mask fusion, eval, and persistence are fully testable without
the (externally downloaded) HF checkpoints. BOTH real transformers backends
also run from a config with zero downloads: ``hf_segmenter`` builds SAM from a
``SamConfig`` (see ``tiny_sam_config``), and ``hf_detector`` builds
GroundingDINO from a ``GroundingDinoConfig`` plus a locally constructed
WordPiece vocab (``tiny_gdino_vocab`` — the processor's text tokenizer needs
no download). Only *pretrained quality* remains weight-gated: the
``from_pretrained`` paths raise in zero-egress environments
(tests/test_aux.py::test_hf_from_pretrained_raises_offline).
"""

from __future__ import annotations

import os

import numpy as np

from weaklysuperviseddl_tpu.ops.resize import resize_nearest

DEFAULT_PROMPTS = ("a cat", "a dog")


def _as_pil(image):
    """The pipeline accepts PIL or HWC uint8 arrays (stub backends handle
    both); the HF processors want PIL."""
    from PIL import Image

    if isinstance(image, Image.Image):
        return image
    return Image.fromarray(np.asarray(image).astype(np.uint8))


# ---------------------------------------------------------------------------
# HF backends (weight-gated)
# ---------------------------------------------------------------------------

def hf_detector(model_name: str = "IDEA-Research/grounding-dino-base",
                box_threshold: float = 0.3, text_threshold: float = 0.25,
                config=None, vocab=None):
    """GroundingDINO zero-shot detector (ref two_stage_foundation.py:31-56).

    ``config`` + ``vocab``: build the model from a transformers
    ``GroundingDinoConfig`` with random weights and a locally constructed
    WordPiece tokenizer (list of tokens; must cover the prompt words) — the
    REAL detector path (processor → GroundingDinoForObjectDetection →
    post_process_grounded_object_detection) runs without any downloads.
    Outputs are meaningless until ``from_pretrained`` weights are swapped in;
    see tiny_gdino_config()/tiny_gdino_vocab().
    """
    import torch
    from transformers import AutoModelForZeroShotObjectDetection, AutoProcessor

    if config is not None:
        import os
        import tempfile

        from transformers import (BertTokenizerFast,
                                  GroundingDinoForObjectDetection,
                                  GroundingDinoProcessor)
        from transformers.models.grounding_dino import GroundingDinoImageProcessor

        if vocab is None:
            vocab = tiny_gdino_vocab()
        if len(vocab) != config.text_config.vocab_size:
            raise ValueError(
                f"vocab size {len(vocab)} != config.text_config.vocab_size "
                f"{config.text_config.vocab_size}")
        tmp = tempfile.mkdtemp()
        with open(os.path.join(tmp, "vocab.txt"), "w") as f:
            f.write("\n".join(vocab))
        tokenizer = BertTokenizerFast(vocab_file=os.path.join(tmp, "vocab.txt"))
        model = GroundingDinoForObjectDetection(config).eval()
        size = config.backbone_config.image_size
        processor = GroundingDinoProcessor(
            GroundingDinoImageProcessor(
                size={"shortest_edge": size, "longest_edge": size}),
            tokenizer,
        )
    else:
        model = AutoModelForZeroShotObjectDetection.from_pretrained(model_name)
        processor = AutoProcessor.from_pretrained(model_name)

    def detect(image_pil, prompts):
        image_pil = _as_pil(image_pil)
        inputs = processor(images=image_pil, text=[list(prompts)], return_tensors="pt")
        with torch.no_grad():
            outputs = model(**inputs)
        target_sizes = torch.tensor([image_pil.size[::-1]])
        results = processor.post_process_grounded_object_detection(
            outputs, inputs.input_ids, threshold=box_threshold,
            text_threshold=text_threshold, target_sizes=target_sizes,
        )[0]
        return np.asarray([b.detach().cpu().numpy() for b in results["boxes"]])

    return detect


def hf_segmenter(model_name: str = "facebook/sam-vit-base", config=None,
                 image_size: int | None = None):
    """SAM box-prompted segmenter (ref two_stage_foundation.py:34-66).

    ``config``: a transformers ``SamConfig`` → build the model from config
    with random weights instead of downloading the checkpoint. This keeps the
    REAL backend (processor → SamModel forward → ``pred_masks[:, 0]``)
    executable in zero-egress environments — outputs are meaningless but the
    integration is exercised end-to-end (tests/test_aux.py); swap in
    ``from_pretrained`` weights for real quality. ``image_size`` must match
    ``config.vision_config.image_size`` when given.
    """
    import torch
    from transformers import SamModel, SamProcessor

    if config is not None:
        from transformers.models.sam import SamImageProcessor

        size = image_size or config.vision_config.image_size
        if size != config.vision_config.image_size:
            raise ValueError(
                f"image_size {size} != config.vision_config.image_size "
                f"{config.vision_config.image_size}: the vision encoder's "
                f"position embeddings are sized for the config value"
            )
        model = SamModel(config)
        processor = SamProcessor(SamImageProcessor(
            size={"longest_edge": size}, pad_size={"height": size, "width": size}))
    else:
        if image_size is not None:
            raise ValueError(
                "image_size only applies with config=; the pretrained "
                "processor carries its own sizing"
            )
        model = SamModel.from_pretrained(model_name)
        processor = SamProcessor.from_pretrained(model_name)
    model = model.eval()

    def segment(image_pil, boxes):
        image_pil = _as_pil(image_pil)
        inputs = processor(image_pil, input_boxes=[[list(b) for b in boxes]],
                           return_tensors="pt")
        with torch.no_grad():
            masks = model(**inputs).pred_masks
        return masks[:, 0].cpu().numpy().squeeze(0)

    return segment


def tiny_gdino_vocab():
    """Minimal WordPiece vocab covering the reference prompts ("a cat",
    "a dog", two_stage_foundation.py:156)."""
    return ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
            "a", "cat", "dog", ".", "an", "animal"]


def tiny_gdino_config():
    """Smallest GroundingDinoConfig that exercises the full stack (tiny Swin
    backbone, 2-layer BERT over tiny_gdino_vocab, 1+1 transformer layers)."""
    from transformers import BertConfig, GroundingDinoConfig, SwinConfig

    text = BertConfig(vocab_size=len(tiny_gdino_vocab()), hidden_size=64,
                      num_hidden_layers=2, num_attention_heads=2,
                      intermediate_size=128, max_position_embeddings=64)
    backbone = SwinConfig(image_size=224, embed_dim=16, depths=[1, 1, 1],
                          num_heads=[1, 1, 1], out_indices=[2, 3])
    return GroundingDinoConfig(
        text_config=text.to_dict(), backbone_config=backbone.to_dict(),
        d_model=64, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        num_queries=20, num_feature_levels=2)


def tiny_sam_config():
    """Smallest SamConfig that exercises the full SAM stack (2 ViT layers,
    256² inputs, default hidden dims — the inter-module dims are coupled)."""
    from transformers import SamConfig, SamPromptEncoderConfig, SamVisionConfig

    vision = SamVisionConfig(num_hidden_layers=2, image_size=256,
                             global_attn_indexes=[1])
    prompt = SamPromptEncoderConfig(image_size=256, image_embedding_size=16)
    return SamConfig(vision_config=vision.to_dict(),
                     prompt_encoder_config=prompt.to_dict())


# ---------------------------------------------------------------------------
# orchestration (reference semantics, backend-agnostic)
# ---------------------------------------------------------------------------

def convert_3channel_to_mask(image_3ch, threshold: float = 0.5):
    """Channel-max > threshold (ref :39-42)."""
    gray = np.max(np.asarray(image_3ch), axis=0)
    return (gray > threshold).astype(np.uint8)


def calculate_iou_and_accuracy(pred_mask, true_mask):
    """Reference :89-97."""
    pred_mask = np.asarray(pred_mask)
    true_mask = np.asarray(true_mask)
    intersection = np.logical_and(pred_mask, true_mask).sum()
    union = np.logical_or(pred_mask, true_mask).sum()
    iou = intersection / union if union != 0 else 1.0
    pixel_accuracy = (pred_mask == true_mask).sum() / pred_mask.size
    return iou, pixel_accuracy


class FoundationPipeline:
    def __init__(self, detector=None, segmenter=None, output_size: int = 224):
        self.detector = detector if detector is not None else hf_detector()
        self.segmenter = segmenter if segmenter is not None else hf_segmenter()
        self.output_size = output_size

    def run_segmentation_pipeline(self, image, prompts=DEFAULT_PROMPTS):
        """Reference :44-74. image: PIL or HWC uint8 array. Returns 224²
        binary mask or None when nothing is detected."""
        boxes = self.detector(image, prompts)
        if boxes is None or len(boxes) == 0:
            return None
        masks = np.asarray(self.segmenter(image, boxes), np.float32)
        if masks.ndim == 2:
            masks = masks[None]
        combined = convert_3channel_to_mask(masks)
        import jax.numpy as jnp

        resized = resize_nearest(
            jnp.asarray(combined), (self.output_size, self.output_size),
            torch_legacy=False,
        )
        return np.asarray(resized, np.uint8)


def evaluate_pipeline_on_dataset(dataset, pipeline: FoundationPipeline,
                                 num_images: int = 100, save_outputs: bool = True,
                                 save_dir: str = "pseudo_masks",
                                 prompts=DEFAULT_PROMPTS, log=print):
    """Reference :99-149: per-image IoU/acc vs trimap∈{1,3}; saves masks and a
    3-panel viz; prints running and final averages."""
    iou_scores, acc_scores = [], []
    if save_outputs:
        os.makedirs(save_dir, exist_ok=True)

    n = min(num_images, len(dataset))
    for idx in range(n):
        image, (_, trimap) = dataset[idx]
        gt_bin = np.isin(np.asarray(trimap), [1, 3]).astype(np.uint8)
        if gt_bin.shape != (pipeline.output_size, pipeline.output_size):
            import jax.numpy as jnp

            gt_bin = np.asarray(resize_nearest(
                jnp.asarray(gt_bin), (pipeline.output_size, pipeline.output_size),
                torch_legacy=False))

        pred_mask = pipeline.run_segmentation_pipeline(image, prompts)
        if pred_mask is None:
            log(f"Image {idx}: No prediction made")
            continue

        iou, acc = calculate_iou_and_accuracy(pred_mask, gt_bin)
        iou_scores.append(iou)
        acc_scores.append(acc)
        log(f"[{idx + 1}/{n}] IoU: {iou:.4f}, Accuracy: {acc:.4f}")

        if save_outputs:
            from PIL import Image as PILImage

            PILImage.fromarray((pred_mask * 255).astype(np.uint8)).save(
                os.path.join(save_dir, f"mask_{idx}.png"))
            _save_viz(image, gt_bin, pred_mask, os.path.join(save_dir, f"viz_{idx}.png"))

    avg_iou = float(np.mean(iou_scores)) if iou_scores else 0.0
    avg_acc = float(np.mean(acc_scores)) if acc_scores else 0.0
    log("\n--- Final Evaluation ---")
    log(f"Average IoU over {len(iou_scores)} images: {avg_iou:.4f}")
    log(f"Average Pixel Accuracy: {avg_acc:.4f}")
    return avg_iou, avg_acc


def _save_viz(image, gt_bin, pred_mask, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(1, 3, figsize=(12, 4))
    axs[0].imshow(np.asarray(image))
    axs[0].set_title("Original Image")
    axs[1].imshow(gt_bin, cmap="gray")
    axs[1].set_title("Ground Truth")
    axs[2].imshow(pred_mask, cmap="gray")
    axs[2].set_title("Predicted Mask")
    for ax in axs:
        ax.axis("off")
    plt.tight_layout()
    plt.savefig(path)
    plt.close(fig)
