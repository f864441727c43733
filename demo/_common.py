"""Shared plumbing for the demo CLIs (paths, video writing)."""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def demo_path() -> pathlib.Path:
    """Output base directory (overridable for tests/deployments)."""
    override = os.environ.get("JRL_DEMO_OUT")
    if override:
        return pathlib.Path(override).absolute()
    return pathlib.Path(__file__).parent.absolute()


def write_video(file_list, out_path, fps=25):
    """Write an mp4 (as the reference does), falling back to an animated
    GIF when no ffmpeg backend is available (the reference repo ships
    GIF versions of every video too)."""
    import imageio

    if not file_list:
        return
    try:
        writer = imageio.get_writer(out_path, fps=fps)
    except Exception:
        out_path = os.path.splitext(str(out_path))[0] + ".gif"
        writer = imageio.get_writer(out_path, duration=1000.0 / fps)
    for im in file_list:
        writer.append_data(imageio.imread(im))
    writer.close()
