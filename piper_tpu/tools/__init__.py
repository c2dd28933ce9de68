"""Dataset QA tools (counterparts of the reference's piper_train
filter_utterances / check_phonemes / clean_cached_audio /
select_speaker scripts)."""
