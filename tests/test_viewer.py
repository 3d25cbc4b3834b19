"""Viewer (scope-equivalent) tests: run discovery, loading, both frontends."""

import json
import threading
import urllib.request

from embodied_tpu import viewer


def write_metrics(rundir, rows):
  rundir.mkdir(parents=True, exist_ok=True)
  with open(rundir / 'metrics.jsonl', 'w') as f:
    for row in rows:
      f.write(json.dumps(row) + '\n')


def make_logdir(tmp_path):
  for name, gain in (('runA', 1.0), ('runB', 2.0)):
    write_metrics(tmp_path / name, [
        {'step': s, 'train/loss': 10.0 - gain * s / 100,
         'episode/score': gain * s, 'timer/agent': 0.5}
        for s in range(0, 1000, 100)])
  return tmp_path


class TestViewer:

  def test_scan_runs(self, tmp_path):
    root = make_logdir(tmp_path)
    runs = viewer.scan_runs(str(root))
    assert len(runs) == 2

  def test_load_series_filter(self, tmp_path):
    root = make_logdir(tmp_path)
    series = viewer.load_series(str(root / 'runA'), 'loss')
    assert list(series) == ['train/loss']
    xs, ys = series['train/loss']
    assert len(xs) == 10 and ys[0] == 10.0

  def test_terminal_render(self, tmp_path):
    root = make_logdir(tmp_path)
    out = viewer.render_terminal(viewer.scan_runs(str(root)), '.*')
    assert 'runA' in out and 'runB' in out
    assert 'episode/score' in out
    assert 'timers' in out  # timer section present

  def test_downsample(self):
    xs = list(range(1000))
    ys = [float(x) for x in xs]
    oxs, oys = viewer.downsample(xs, ys, limit=100)
    assert len(oxs) == 100
    assert oys[0] < oys[-1]

  def test_svg_path(self):
    path = viewer.svg_path([0, 1, 2], [0.0, 1.0, 0.5])
    assert path.startswith('M') and 'L' in path

  def test_web_page_renders(self, tmp_path):
    root = make_logdir(tmp_path)
    page = viewer.render_page(str(root), 'score')
    assert 'episode/score' in page and '<svg' in page
    assert 'train/loss' not in page

  def test_http_server(self, tmp_path):
    import http.server
    import urllib.parse
    root = make_logdir(tmp_path)
    # Build the handler inline (serve() blocks); reuse render_page.
    class Handler(http.server.BaseHTTPRequestHandler):
      def do_GET(self):
        body = viewer.render_page(str(root), '.*').encode()
        self.send_response(200)
        self.send_header('Content-Length', str(len(body)))
        self.end_headers()
        self.wfile.write(body)
      def log_message(self, *args):
        pass
    server = http.server.ThreadingHTTPServer(('127.0.0.1', 0), Handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
      with urllib.request.urlopen(
          f'http://127.0.0.1:{port}/', timeout=10) as resp:
        html = resp.read().decode()
      assert 'embodied_tpu viewer' in html
      assert 'episode/score' in html
    finally:
      server.shutdown()


class TestProfileView:

  def _profile_logdir(self, tmp_path):
    write_metrics(tmp_path / 'run', [
        {'step': s,
         'train/loss': 5.0,
         'timer/agent_policy/frac': 0.5 - s / 4000,
         'timer/learner_tick/frac': 0.3 + s / 4000,
         'timer/episode_log/frac': 0.05,
         'timer/agent_policy/avg': 0.01,
         }
        for s in range(0, 1000, 100)])
    return tmp_path

  def test_profile_series_extracts_frac_keys(self, tmp_path):
    root = self._profile_logdir(tmp_path)
    series = viewer.load_series(str(root / 'run'), '.*')
    prof = viewer.profile_series(series)
    assert set(prof) == {'agent_policy', 'learner_tick', 'episode_log'}
    xs, ys = prof['agent_policy']
    assert len(xs) == 10 and abs(ys[0] - 0.5) < 1e-9

  def test_svg_stack_orders_and_scales(self):
    layers = [
        ('a', [0, 1, 2], [0.5, 0.5, 0.5]),
        ('b', [0, 1, 2], [0.25, 0.25, 0.25]),
    ]
    polys = viewer.svg_stack(layers)
    assert [name for name, _ in polys] == ['a', 'b']
    assert all(pts for _, pts in polys)

  def test_profile_chart_in_page(self, tmp_path):
    root = self._profile_logdir(tmp_path)
    page = viewer.render_page(str(root), 'loss')
    assert 'profile ·' in page
    assert '<polygon' in page
    assert 'agent_policy' in page
    assert 'learner_tick' in page
    # The raw timer series are not rendered as individual metric charts.
    assert 'timer/agent_policy/frac ·' not in page


class TestTimerMetricsContract:
  """run protocols emit numeric timer series the profile view consumes."""

  def test_timer_metrics_reach_jsonl(self, tmp_path):
    import json as jsonlib
    from functools import partial as bind
    from embodied_tpu import core, run
    from embodied_tpu.core import streams
    from embodied_tpu.envs import Dummy
    from embodied_tpu.utils import (
        Config, Counter, JSONLOutput, Logger, TerminalOutput)
    import utils as test_utils

    def make_env(index):
      return Dummy('disc', size=(8, 8), length=100)

    env = make_env(0)
    agent = test_utils.TestAgent(env.obs_space, env.act_space)
    env.close()
    args = Config(
        logdir=str(tmp_path), steps=400, duration=0, train_ratio=8.0,
        log_every=0.05, report_every=0.05, save_every=0.05, batch_size=4,
        batch_length=8, report_batches=1, consec_report=1,
        from_checkpoint='', envs=2, debug=True, usage={'psutil': False})
    logger = Logger(
        Counter(), [TerminalOutput(limit=3), JSONLOutput(str(tmp_path))])
    run.train(
        lambda: agent,
        lambda: core.Replay(length=8, capacity=1e4, chunksize=64),
        make_env,
        lambda replay, mode: streams.Stateless(
            bind(replay.sample, args.batch_size, mode)),
        lambda: logger, args)
    keys = set()
    with open(tmp_path / 'metrics.jsonl') as f:
      for line in f:
        keys.update(jsonlib.loads(line))
    frac_keys = [k for k in keys if k.startswith('timer/')
                 and k.endswith('/frac')]
    assert frac_keys, sorted(keys)
    # The viewer turns exactly these into the profile view.
    series = viewer.load_series(str(tmp_path), '.*')
    assert viewer.profile_series(series), sorted(series)


class TestTraceView:
  """The /trace view parses the agent's xplane profiler dumps directly."""

  def _write_trace(self, tmp_path):
    pb2 = viewer._xplane_pb2()
    if pb2 is None:
      import pytest
      pytest.skip('no xplane proto parser in this environment')
    space = pb2.XSpace()
    plane = space.planes.add()
    plane.name = '/device:TPU:0'
    plane.event_metadata[1].name = '%fusion.7 = f32[16,64] fusion(...)'
    plane.event_metadata[2].name = '%custom-call.2 = observe_seq(...)'
    line = plane.lines.add()
    line.name = 'XLA Ops'
    line.timestamp_ns = 1000
    for mid, off, dur in ((1, 0, 5000), (2, 5000, 2500), (1, 8000, 5000)):
      ev = line.events.add()
      ev.metadata_id = mid
      ev.offset_ps = off * 1000000
      ev.duration_ps = dur * 1000000
    host = space.planes.add()
    host.name = '/host:CPU'  # must be ignored by the loader
    tracedir = tmp_path / 'plugins' / 'profile' / '2026_01_01'
    tracedir.mkdir(parents=True)
    path = tracedir / 'host.xplane.pb'
    path.write_bytes(space.SerializeToString())
    return str(path)

  def test_load_trace_aggregates_device_ops(self, tmp_path):
    path = self._write_trace(tmp_path)
    trace = viewer.load_trace(path)
    ops = {name: (total, n) for name, total, n in trace['ops']}
    assert ops['fusion.7'] == (10000.0, 2), ops
    assert ops['custom-call.2'] == (2500.0, 1), ops
    assert len(trace['lanes']) == 1
    lane, events = trace['lanes'][0]
    assert 'TPU' in lane and len(events) == 3

  def test_render_trace_page(self, tmp_path):
    self._write_trace(tmp_path)
    # A metrics file makes the directory a run; the trace sits next to it.
    (tmp_path / 'metrics.jsonl').write_text('{"step": 1, "loss": 1.0}\n')
    html = viewer.render_trace(str(tmp_path))
    assert 'fusion.7' in html and 'custom-call.2' in html
    assert '<svg' in html and 'rect' in html
    page = viewer.render_trace_page(str(tmp_path))
    assert 'fusion.7' in page

  def test_trace_page_without_traces(self, tmp_path):
    (tmp_path / 'metrics.jsonl').write_text('{"step": 1, "loss": 1.0}\n')
    page = viewer.render_trace_page(str(tmp_path))
    assert 'No profiler traces' in page
