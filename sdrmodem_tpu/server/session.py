"""RX/TX session management — the async analog of the reference's
tcp_worker / dsp_worker / sdr_worker triad (src/tcp_server.c,
src/dsp_worker.c, src/sdr_worker.c).

- An RxSession owns the per-client demod pipeline (queue → dump →
  doppler → fsk_demod → dump/socket), one task instead of one thread.
- An SdrStream owns one SDR device reader and fans buffers out to every
  attached session (connection sharing: a new client reuses a stream
  with equal center_freq, offset, and sampling_freq >= requested —
  sdr_worker_find_closest, src/sdr_worker.c:83-95).
- TX runs inline in the client connection handler, one TxData at a time
  with a synchronous ack (src/tcp_server.c:176-241).
"""

from __future__ import annotations

import asyncio
import logging
from dataclasses import dataclass, field

import numpy as np

from sdrmodem_tpu.devices.base import SdrDevice
from sdrmodem_tpu.dsp.doppler import Doppler
from sdrmodem_tpu.dsp.fsk_demod import FskDemodConfig
from sdrmodem_tpu.dsp.pipeline import DemodPipeline
from sdrmodem_tpu.dsp.streaming import StreamingGfskMod
from sdrmodem_tpu.server import wire
from sdrmodem_tpu.server.config import RxSdrType, ServerConfig
from sdrmodem_tpu.utils.queue import BufferQueue

log = logging.getLogger("sdrmodem.session")


def doppler_from_settings(
    settings: wire.DopplerSettings,
    sampling_freq: int,
    center_freq: int,
    constant_offset: int,
    start_time_seconds: int,
) -> Doppler:
    """Construct Doppler with the reference's exact unit quirks:
    lat/lon wire values divided by 10E6 (=1e7) and altitude by 10E3
    (src/dsp_worker.c:130, src/tcp_server.c:549)."""
    return Doppler(
        latitude=settings.latitude / 10e6,
        longitude=settings.longitude / 10e6,
        altitude_km=settings.altitude / 10e3,
        sampling_freq=sampling_freq,
        center_freq=center_freq,
        tle_lines=wire.tle_to_lines(settings.tle),
        constant_offset=constant_offset,
        start_time_seconds=start_time_seconds,
    )


@dataclass
class RxKey:
    """Connection-sharing key (struct sdr_rx analog)."""

    center_freq: int
    sampling_freq: int
    offset: int

    def matches(self, other: "RxKey") -> bool:
        """sdr_worker_find_closest: equal tuning, adequate rate."""
        return (
            self.center_freq == other.center_freq
            and self.sampling_freq >= other.sampling_freq
            and self.offset == other.offset
        )


class RxSession:
    """Per-client demodulation lane (dsp_worker analog)."""

    def __init__(
        self,
        client_id: int,
        req: wire.RxRequest,
        config: ServerConfig,
        writer: asyncio.StreamWriter | None,
    ):
        self.id = client_id
        self.req = req
        self.writer = writer
        self.config = config
        fsk = req.fsk_settings
        self.demod = DemodPipeline(
            FskDemodConfig(
                sampling_freq=req.rx_sampling_freq,
                baud_rate=req.demod_baud_rate,
                deviation=fsk.demod_fsk_deviation,
                decimation=req.demod_decimation,
                transition_width=fsk.demod_fsk_transition_width,
                use_dc_block=fsk.demod_fsk_use_dc_block,
            ),
            block_size=config.buffer_size,
            exact=True,
        ).streamer()
        self.doppler: Doppler | None = None
        if req.doppler is not None:
            start = req.file_settings.start_time_seconds if req.file_settings else 0
            self.doppler = doppler_from_settings(
                req.doppler, req.rx_sampling_freq, req.rx_center_freq, 0, start
            )
        # blocking queue iff rx source is a file (no drops; dsp_worker.c:176-179)
        self.queue = BufferQueue(
            config.queue_size, blocking=config.rx_sdr_type == RxSdrType.FILE
        )
        self.rx_dump = (
            open(f"{config.base_path}/rx.sdr2demod.{client_id}.cf32", "wb")
            if req.rx_dump_file
            else None
        )
        dest = req.demod_destination
        self.demod_dump = (
            open(f"{config.base_path}/rx.demod2client.{client_id}.s8", "wb")
            if dest in (wire.DemodDestination.FILE, wire.DemodDestination.BOTH)
            else None
        )
        self.to_socket = dest in (wire.DemodDestination.SOCKET, wire.DemodDestination.BOTH)
        self.task: asyncio.Task | None = None
        self.finished = asyncio.Event()
        # observability counters (the reference logs per-client byte totals)
        self.samples_in = 0
        self.symbols_out = 0

    def start(self):
        self.task = asyncio.create_task(self._run(), name=f"rx-session-{self.id}")

    async def _run(self):
        log.info("[%d] dsp_worker is starting", self.id)
        # The ragged-block pipeline runs any chunk size through ONE
        # compiled program, so buffers are processed as they arrive
        # (the reference's per-buffer dsp_worker loop).
        try:
            while True:
                buf = await self.queue.take()
                if buf is None:
                    break  # poison pill
                if self.rx_dump is not None:
                    self.rx_dump.write(np.asarray(buf, np.complex64).tobytes())
                if self.doppler is not None:
                    buf = await asyncio.to_thread(self.doppler.process_rx, buf)
                self.samples_in += len(buf)
                symbols = await asyncio.to_thread(self.demod.process, buf)
                self.symbols_out += len(symbols)
                if len(symbols) == 0:
                    continue
                if self.demod_dump is not None:
                    self.demod_dump.write(symbols.tobytes())
                if self.to_socket and self.writer is not None:
                    try:
                        self.writer.write(symbols.tobytes())
                        await self.writer.drain()
                    except (ConnectionError, RuntimeError):
                        break
        except asyncio.CancelledError:
            pass
        except Exception:
            log.exception("[%d] dsp_worker failed", self.id)
        finally:
            if self.rx_dump:
                self.rx_dump.close()
            if self.demod_dump:
                self.demod_dump.close()
            self.finished.set()
            log.info(
                "[%d] dsp_worker stopped (%d samples in, %d symbols out)",
                self.id, self.samples_in, self.symbols_out,
            )

    async def put(self, buf: np.ndarray):
        await self.queue.put(buf)

    async def stop(self):
        await self.queue.interrupt()
        if self.task:
            await self.task


class SdrStream:
    """One reader per distinct SDR stream, fanning out to sessions
    (sdr_worker analog)."""

    def __init__(self, stream_id: int, key: RxKey, device: SdrDevice):
        self.id = stream_id
        self.key = key
        self.device = device
        self.sessions: list[RxSession] = []
        self.task: asyncio.Task | None = None

    def start(self):
        self.task = asyncio.create_task(self._run(), name=f"sdr-stream-{self.id}")

    def add_session(self, session: RxSession):
        self.sessions.append(session)

    async def _run(self):
        try:
            while True:
                buf = await self.device.read_stream()
                if buf is None:
                    break
                for session in list(self.sessions):
                    await session.put(buf)
        except asyncio.CancelledError:
            pass
        except Exception:
            log.exception("[%d] sdr stream failed", self.id)
        finally:
            # stream ended: poison-pill every attached session (:49-53)
            for session in list(self.sessions):
                await session.queue.interrupt()

    async def remove_session(self, session: RxSession) -> bool:
        """Detach; returns True when the stream itself was torn down."""
        if session in self.sessions:
            self.sessions.remove(session)
        if not self.sessions:
            # stop the reader task before the graceful-shutdown drain so the
            # two never contend for the same stream reader
            if self.task:
                self.task.cancel()
                try:
                    await self.task
                except asyncio.CancelledError:
                    pass
            await self.device.stop_rx()
            await self.device.close()
            return True
        return False


class TxSession:
    """Per-client modulation state (tcp_worker TX-side analog)."""

    def __init__(
        self,
        client_id: int,
        req: wire.TxRequest,
        config: ServerConfig,
        device: SdrDevice | None,
    ):
        from sdrmodem_tpu.dsp.gfsk_mod import GfskModConfig
        from sdrmodem_tpu.dsp.nco_host import HostNco

        self.id = client_id
        self.req = req
        self.config = config
        self.device = device
        self.mod = StreamingGfskMod(
            GfskModConfig.from_radio(
                req.tx_sampling_freq, req.mod_baud_rate, req.fsk_settings.mod_fsk_deviation
            )
        )
        self.doppler: Doppler | None = None
        self.nco: HostNco | None = None
        if req.doppler is not None:
            start = req.file_settings.start_time_seconds if req.file_settings else 0
            self.doppler = doppler_from_settings(
                req.doppler, req.tx_sampling_freq, req.tx_center_freq, req.tx_offset, start
            )
        elif req.tx_offset != 0:
            self.nco = HostNco(req.tx_sampling_freq)
        self.tx_dump = (
            open(f"{config.base_path}/tx.mod2sdr.{client_id}.cf32", "wb")
            if req.tx_dump_file
            else None
        )

    async def handle_tx_data(self, data: bytes) -> int:
        """Modulate + shift + dump + transmit one TxData payload in
        buffer_size batches.  Returns a ResponseDetails error or 0."""
        for start in range(0, len(data), self.config.buffer_size):
            batch = data[start : start + self.config.buffer_size]
            iq = await asyncio.to_thread(self.mod.process, batch)
            if self.doppler is not None:
                iq = await asyncio.to_thread(self.doppler.process_tx, iq)
            elif self.nco is not None:
                iq = self.nco.mix(self.req.tx_offset, iq)
            if self.tx_dump is not None:
                self.tx_dump.write(np.asarray(iq, np.complex64).tobytes())
                # full disk ignored: keep transmitting (tcp_server.c:214-221)
            if self.device is not None:
                try:
                    await self.device.write_stream(iq)
                except Exception:
                    log.exception("[%d] unable to transmit request fully", self.id)
                    return wire.ResponseDetails.INTERNAL_ERROR
        return 0

    async def close(self):
        if self.tx_dump:
            self.tx_dump.close()
        if self.device is not None:
            await self.device.close()
