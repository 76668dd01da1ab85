"""Pipeline test assets: lexicon json, font collection folder (DejaVu),
corpus txt, background/symbol images — all generated on the fly."""
import json
import os
import shutil
from pathlib import Path

import numpy as np

from tests.engine.fixtures import ASCII_CHARS, get_dejavu_font_files
from vkit_tpu.element import Image
from vkit_tpu.utility.text import get_lexicon_type


def build_assets(root: Path) -> dict:
    root.mkdir(parents=True, exist_ok=True)

    # Lexicon.
    lexicon_json = root / 'lexicon.json'
    lexicon_json.write_text(
        json.dumps([
            {'char': char, 'aliases': [], 'tags': [get_lexicon_type(char).value]}
            for char in ASCII_CHARS
        ])
    )

    # Font collection folder.
    font_fd = root / 'font_collection' / 'font'
    font_meta_fd = root / 'font_collection' / 'font_meta'
    font_fd.mkdir(parents=True, exist_ok=True)
    font_meta_fd.mkdir(parents=True, exist_ok=True)
    sans, _ = get_dejavu_font_files()
    font_files = []
    for src in sans[:2]:
        dst = font_fd / os.path.basename(src)
        if not dst.exists():
            shutil.copyfile(src, dst)
        font_files.append(os.path.basename(src))
    (font_meta_fd / 'dejavu.json').write_text(
        json.dumps({
            'name': 'dejavu',
            'mode': 'vttc',
            'char_to_tags': {char: ['ascii'] for char in ASCII_CHARS},
            'font_files': font_files,
            'font_glyph_info_collection': {
                'font_glyph_infos': [{
                    'tags': ['ascii'],
                    'ascent_plus_pad_up_min_to_font_size_ratio': 0.8,
                    'height_min_to_font_size_ratio': 1.0,
                    'width_min_to_font_size_ratio': 0.6,
                }]
            },
        })
    )

    # Corpus.
    corpus_txt = root / 'corpus.txt'
    corpus_txt.write_text(
        '\n'.join([
            'the quick brown fox jumps over the lazy dog 0123456789',
            'pack my box with five dozen liquor jugs',
            'sphinx of black quartz judge my vow',
            'how vexingly quick daft zebras jump',
        ] * 25)
    )

    # Background images.
    bg_fd = root / 'bg_images'
    bg_fd.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for idx in range(2):
        small = rng.integers(140, 235, (8, 8, 3), dtype=np.uint8)
        mat = np.kron(small, np.ones((40, 40, 1), dtype=np.uint8))
        Image(mat=mat).to_file(str(bg_fd / f'bg_{idx}.png'))

    # Symbol images (grayscale icons).
    symbol_fd = root / 'symbol_images'
    symbol_fd.mkdir(exist_ok=True)
    for idx in range(2):
        mat = np.zeros((32, 32), dtype=np.uint8)
        mat[4:28, 14:18] = 255
        mat[14:18, 4:28] = 255
        if idx:
            mat = mat.T.copy()
        Image(mat=mat).to_file(
            str(symbol_fd / f'symbol_{idx}.png'), disable_to_rgb_image=True
        )

    return {
        'lexicon_json': str(lexicon_json),
        'font_collection_folder': str(root / 'font_collection'),
        'corpus_txt': str(corpus_txt),
        'bg_image_folder': str(bg_fd),
        'symbol_image_folder': str(symbol_fd),
    }


def build_step_configs(assets: dict) -> list:
    """Full 17-step config (reduced page size for tests)."""
    return [
        {
            'name': 'text_detection.page_shape_step',
            'config': {'area': 640 * 640},
        },
        {
            'name': 'text_detection.page_background_step',
            'config': {
                'image_configs': [
                    {
                        'type': 'selector',
                        'weight': 1,
                        'config': {'image_folders': [assets['bg_image_folder']]},
                    },
                ],
            },
        },
        {'name': 'text_detection.page_layout_step'},
        {
            'name': 'text_detection.page_image_step',
            'config': {
                'image_configs': [
                    {
                        'type': 'selector',
                        'weight': 1,
                        'config': {'image_folders': [assets['bg_image_folder']]},
                    },
                ],
            },
        },
        {'name': 'text_detection.page_barcode_step'},
        {
            'name': 'text_detection.page_seal_impresssion_step',
            'config': {
                'seal_impression_configs': [
                    {'type': 'ellipse', 'weight': 1, 'config': {}},
                ],
            },
        },
        {
            'name': 'text_detection.page_text_line_step',
            'config': {
                'lexicon_collection_json': assets['lexicon_json'],
                'font_collection_folder': assets['font_collection_folder'],
                'char_sampler_configs': [
                    {
                        'type': 'corpus',
                        'weight': 1,
                        'config': {'txt_files': [assets['corpus_txt']]},
                    },
                ],
                'font_configs': [
                    {'type': 'freetype_default', 'weight': 1, 'config': {}},
                ],
            },
        },
        {
            'name': 'text_detection.page_non_text_symbol_step',
            'config': {'symbol_image_folders': [assets['symbol_image_folder']]},
        },
        {'name': 'text_detection.page_text_line_bounding_box_step'},
        {
            'name': 'text_detection.page_text_line_label_step',
            'config': {
                'enable_text_line_mask': True,
                'enable_boundary_mask': True,
                'enable_boundary_score_map': True,
            },
        },
        {'name': 'text_detection.page_assembler_step'},
        {
            'name': 'text_detection.page_distortion_step',
            'config': {
                'random_distortion_factory_config': {
                    'disabled_policy_names': ['defocus_blur', 'zoom_in_blur'],
                    'num_photometric_max': 1,
                },
            },
        },
        {'name': 'text_detection.page_resizing_step'},
        {
            'name': 'text_detection.page_cropping_step',
            'config': {'core_size': 256, 'pad_size': 32, 'num_samples': 2},
        },
        {'name': 'text_detection.page_text_region_step'},
        {'name': 'text_detection.page_text_region_label_step'},
        {
            'name': 'text_detection.page_text_region_cropping_step',
            'config': {
                'core_size': 256,
                'pad_size': 32,
                'num_centroid_points_min': 5,
                'num_deviate_points_min': 5,
            },
        },
    ]
