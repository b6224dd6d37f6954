"""Every reference script flag must parse on its CLI counterpart.

SURVEY.md §5 (config/flag system): "preserve every reference flag
name/semantic". This test greps each reference script's argparse and checks
the mapped subcommand accepts every ``--flag`` (directly or via an alias).
Skipped when the reference checkout is absent.
"""

import re
from pathlib import Path

import pytest

from adipose_tpu.cli.main import build_parser

REFERENCE = Path("/root/reference")

SCRIPT_TO_COMMAND = {
    "Segmentation/build_dataset.py": "build-dataset",
    "Segmentation/build_test_dataset.py": "build-test-dataset",
    "Classification/build_test_class_dataset.py": "build-test-class-dataset",
    "Segmentation/train_adipose_unet_v3.py": "train-unet",
    "Segmentation/full_evaluation_enhanced.py": "evaluate",
    "Segmentation/segmentation_inference.py": "segment",
    "Segmentation/reconstruct_full_images.py": "reconstruct",
    "Segmentation/evaluate_all_checkpoints.py": "evaluate-checkpoints",
    "Segmentation/tile_classification_evaluation.py": "tile-classification-eval",
    "Segmentation/visualize_checkpoint_metrics.py": "visualize-metrics",
    "Classification/build_class_dataset.py": "build-class-dataset",
    "Classification/train_adipose_classifier_v0.py": "train-classifier",
    "Classification/eval_adipose_classifier.py": "eval-classifier",
    "Classification/classification_inference.py": "classify",
    "Classification/reconstruct_wsi_classification.py": "classification-overlay",
    "pre-post-processing_tools/large_wsi_to_small_wsi_MS.py": "chunk-wsi",
    "pre-post-processing_tools/preprocess_small_MS_SIMs.py": "preprocess-ecm",
    "pre-post-processing_tools/ECM_scaling.py": "scale-ecm",
    "pre-post-processing_tools/compare_pseudocolored_ecm_tiles.py": "compare-modalities",
    "pre-post-processing_tools/convert_tif_to_jpg.py": "tif2jpg",
    # the six normalization-comparison analyses are analyze-tiles modes
    "pre-post-processing_tools/analysis/contrast_and_normalization_analysis/"
    "compare_clahe_percentile.py": "analyze-tiles",
    "pre-post-processing_tools/analysis/contrast_and_normalization_analysis/"
    "compare_final_methods.py": "analyze-tiles",
    "pre-post-processing_tools/analysis/contrast_and_normalization_analysis/"
    "compare_normalization_methods.py": "analyze-tiles",
    "pre-post-processing_tools/analysis/contrast_and_normalization_analysis/"
    "compare_requested_methods.py": "analyze-tiles",
    "pre-post-processing_tools/analysis/contrast_and_normalization_analysis/"
    "compare_very_final.py": "analyze-tiles",
    "pre-post-processing_tools/analysis/contrast_and_normalization_analysis/"
    "comprehensive_normalization_analysis.py": "analyze-tiles",
}


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout absent")
@pytest.mark.parametrize("script,command", sorted(SCRIPT_TO_COMMAND.items()))
def test_reference_flags_accepted(script, command):
    txt = (REFERENCE / script).read_text(errors="ignore")
    ref_flags = set(re.findall(r'add_argument\(\s*["\'](--[a-z0-9-]+)["\']', txt))
    assert ref_flags, f"no flags parsed from {script}"

    sp = build_parser()._subparsers._group_actions[0].choices[command]
    ours = {o for act in sp._actions for o in act.option_strings
            if o.startswith("--")}
    missing = sorted(ref_flags - ours)
    assert not missing, f"{command} missing reference flags: {missing}"
