from .transcribe import Transcription
