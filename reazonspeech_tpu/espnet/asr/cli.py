"""USAGE

    reazonspeech-espnet-asr [-h] [--to={vtt,srt,ass,json,tsv}] [-o file] audio

OPTIONS

    audio
        Audio file to transcribe (WAV first-party; other containers when an
        ffmpeg binary is on PATH).

    -h, --help
        Print this help message.

    --to={vtt,srt,ass,json,tsv}
        Output format for transcription

    -o file, --output=file
        File to write transcription

EXAMPLES

    # Transcribe audio file
    $ reazonspeech-espnet-asr sample.wav

    # Output subtitles in VTT format
    $ reazonspeech-espnet-asr -o sample.vtt sample.wav

CLI parity: pkg/espnet-asr/src/cli.py:1-77 (same flags and flow).
"""

import getopt
import sys
import warnings

from ...core.audio import audio_from_path
from ...core.writers import get_writer
from .transcribe import load_model, transcribe


def main():
    outpath = None
    outext = None

    opts, args = getopt.getopt(sys.argv[1:], "ho:", ("help", "output=", "to="))
    for k, v in opts:
        if k in ("-h", "--help"):
            print(__doc__, file=sys.stderr)
            return
        elif k in ("-o", "--output"):
            outpath = v
        elif k == "--to":
            outext = v

    if not args:
        print("no audio file specified", file=sys.stderr)
        print(__doc__, file=sys.stderr)
        return 1

    if outpath is not None:
        outfile = open(outpath, "w")
    else:
        outfile = sys.stdout

    warnings.simplefilter("ignore")

    audio = audio_from_path(args[0])
    model = load_model()

    ret = transcribe(model, audio)

    with outfile:
        writer = get_writer(outfile, outext)
        writer.write_header()
        for ts in ret.segments:
            writer.write(ts)


if __name__ == "__main__":
    sys.exit(main())
