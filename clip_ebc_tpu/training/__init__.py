from .schedule import warmup_cosine_restarts
