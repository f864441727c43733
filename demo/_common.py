"""Shared plumbing for the demo CLIs (paths, video writing)."""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def demo_path() -> pathlib.Path:
    return pathlib.Path(__file__).parent.absolute()


def write_video(file_list, out_path, fps=25):
    import imageio

    writer = imageio.get_writer(out_path, fps=fps)
    for im in file_list:
        writer.append_data(imageio.imread(im))
    writer.close()
