"""Scheduler-backed Server: continuous batching behind the same async API.

Opt-in throughput mode (BLAMA_SCHEDULER=<max_batch> on the HTTP server):
/complete and /chat/completions run on the ContinuousBatchingScheduler (many
requests share batched decode steps, per-request seeds), while the
verification endpoints stay on the deterministic solo-Session path — replay
must be teacher-forced against a single-sequence cache state (SURVEY.md §7.2
step 8: "verification requests runnable as teacher-forced batches" is the
round-2 extension; batch-invariance of rows is already tested).
"""

from __future__ import annotations

from typing import Callable

from ..runtime.chat import ChatFormat, ChatMsg
from ..runtime.instance import InstanceInitParams
from ..runtime.model import Model
from ..runtime.sampler import SamplerParams
from .scheduler import ContinuousBatchingScheduler, GenRequest
from .server import (
    ChatCompleteRequestParams,
    CompleteRequestParams,
    CompleteResponse,
    LogitData,
    Server,
    TokenData,
)


class SchedulerServer(Server):
    """Server facade whose generation endpoints run on the batching scheduler."""

    def __init__(self, model: Model, instance_params: InstanceInitParams | None = None,
                 max_batch: int = 8, paged: bool = False, n_pages: int = 0,
                 horizon: int = 0, multihost: bool = False):
        # multihost: every device op must be a broadcast-replayed scheduler
        # dispatch (parallel/multihost.SchedulerHostLoop), so the solo
        # Instance is skipped and the scheduler thread starts through the
        # host loop on host 0.
        super().__init__(model, instance_params, create_instance=not multihost)
        ctx = (instance_params.ctx_size if instance_params else 0) or model.config.n_ctx_train
        self.scheduler = ContinuousBatchingScheduler(
            model, max_batch=max_batch, ctx_size=ctx, paged=paged,
            n_pages=n_pages, horizon=horizon)
        self.host_loop = None
        if multihost:
            from ..parallel.multihost import SchedulerHostLoop

            self.host_loop = SchedulerHostLoop(self.scheduler)
            self.host_loop.start()
        else:
            self.scheduler.start()

    def close(self) -> None:
        if self.host_loop is not None:
            self.host_loop.stop()
        else:
            self.scheduler.stop()
        super().close()

    def metrics_snapshot(self) -> dict:
        snap = super().metrics_snapshot()
        snap["scheduler"] = self.scheduler.metrics.snapshot()
        return snap

    # -- generation endpoints go through the scheduler -----------------------

    def _submit(self, prompt_tokens, params, cb: Callable[[CompleteResponse], None]) -> None:
        vocab = self._model.vocab
        req = GenRequest(
            prompt=prompt_tokens,
            max_tokens=params.max_tokens or 128,
            sampler_params=SamplerParams(
                rng_seed=params.seed, temp=params.temperature, top_p=params.top_p
            ),
        )

        def done(preds):
            resp = CompleteResponse(
                TokenData(
                    token_str=vocab.token_to_string(p.token),
                    token_id=p.token,
                    logits=[LogitData(td.token, td.logit) for td in p.logits],
                )
                for p in preds
            )
            resp.finish_reason = req.finish_reason
            cb(resp)

        req.on_done = done
        self.scheduler.submit(req)

    def complete_text(self, params: CompleteRequestParams, cb) -> None:
        tokens = self._model.vocab.tokenize(params.prompt, True, True)
        self._submit(tokens, params, cb)

    def chat_complete(self, params: ChatCompleteRequestParams, cb) -> None:
        chat_params = ChatFormat.get_chat_params(self._model)
        fmt = ChatFormat(chat_params)
        text = fmt.format_chat([ChatMsg(m.role, m.content) for m in params.messages], True)
        tokens = self._model.vocab.tokenize(text, True, True)
        self._submit(tokens, params, cb)

    # -- verification runs as teacher-forced batch rows (SURVEY §7.2 step 8) --

    def _submit_verify(self, prompt_tokens, resp: CompleteResponse, cb) -> None:
        from .scheduler import VerifyRequest

        self.scheduler.submit(VerifyRequest(
            prompt=prompt_tokens,
            predictions=self._response_to_predictions(resp),
            on_done=cb,
        ))

    def verify(self, req: CompleteRequestParams, resp: CompleteResponse, cb) -> None:
        tokens = self._model.vocab.tokenize(req.prompt, True, True)
        self._submit_verify(tokens, resp, cb)

    def chat_verify(self, req: ChatCompleteRequestParams, resp: CompleteResponse, cb) -> None:
        fmt = self._format_chat(req)
        tokens = self._model.vocab.tokenize(fmt, True, True)
        self._submit_verify(tokens, resp, cb)
