from . import audio, testsig  # noqa: F401
