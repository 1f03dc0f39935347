classdef StreamReader < handle
    % StreamReader: pure-M reader for the river_spark FILE backend.
    %
    % API parity with the reference MATLAB binding (matlab/StreamReader.m
    % in pbotros/river: initialize / read_table / stop /
    % schema_field_names / schema_field_types / new_table), re-expressed
    % over the file-backend layout instead of a MEX core:
    %
    %   <root>/<stream>/metadata.json
    %   <root>/<stream>/segment_NNNNNN/batch_<idx12>_<n>_<ms>_<seq>.bin|.npz
    %   <root>/<stream>/segment_NNNNNN/{tombstone.json|eof.json}
    %
    % .bin batches are packed little-endian records (fixed width);
    % .npz batches (variable width) are ZIP files holding numpy v1.0
    % .npy members "data" (uint8 payload) and "sizes" (int64 per-sample
    % lengths) — both parsed here in pure M.
    %
    % Usage:
    %   r = StreamReader('/path/to/log_root');
    %   r.initialize('my_stream');
    %   t = r.read_table(1000, 5.0);   % up to 1000 samples, 5 s timeout
    %   r.stop();

    properties (SetAccess = private)
        root
        name
        schema            % StreamSchema
        user_metadata     % struct
        segment           % current segment index
        cursor            % next sample index to read (global)
        finished          % true once EOF consumed
    end

    methods
        function this = StreamReader(log_root)
            this.root = log_root;
            this.finished = false;
        end

        function initialize(this, stream_name, timeout_s)
            if nargin < 3; timeout_s = 10.0; end
            this.name = stream_name;
            meta_path = fullfile(this.root, stream_name, 'metadata.json');
            deadline = tic;
            while ~isfile(meta_path)
                if toc(deadline) > timeout_s
                    error('river_spark:timeout', 'stream %s not found', stream_name);
                end
                pause(0.05);
            end
            meta = jsondecode(fileread(meta_path));
            this.schema = StreamSchema(meta.schema);
            if isfield(meta, 'user_metadata')
                this.user_metadata = meta.user_metadata;
            else
                this.user_metadata = struct();
            end
            if isfield(meta, 'first_segment')
                this.segment = double(meta.first_segment);
            else
                this.segment = 0;
            end
            this.cursor = 0;
        end

        function out = stream_name(this)
            out = this.name;
        end

        function out = schema_field_names(this)
            out = this.schema.field_names();
        end

        function out = schema_field_types(this)
            out = this.schema.field_types();
        end

        function out = new_table(this, n)
            out = this.schema.new_table(n);
        end

        function out = metadata(this)
            out = this.user_metadata;
        end

        function seek(this, sample_index)
            % Forward-only seek: skip ahead without decoding payloads
            % (batch filenames carry start index + count, so a seek never
            % opens a data file — parity with the Python reader).
            if sample_index < this.cursor
                error('river_spark:seek', 'seek is forward-only');
            end
            this.cursor = sample_index;
        end

        function [t, n_read] = read_table(this, n, timeout_s)
            % Blocking ranged read: up to n samples as a MATLAB table.
            % Returns early with what is available once anything is
            % readable; blocks up to timeout_s while the stream is live
            % and empty; returns an empty table with n_read = -1 once
            % EOF is consumed and nothing remains.
            if nargin < 3; timeout_s = 5.0; end
            deadline = tic;
            while true
                [rows, got] = this.collect_(n);
                if got > 0 || this.finished || toc(deadline) > timeout_s
                    break
                end
                pause(0.05);
            end
            if got == 0 && this.finished
                t = this.schema.new_table(0);
                n_read = -1;
                return
            end
            t = rows;
            n_read = got;
        end

        function stop(this)
            % no persistent handles: nothing to release (API parity)
        end
    end

    methods (Access = private)
        function [t, got] = collect_(this, n)
            sch = this.schema;
            t = sch.new_table(0);
            got = 0;
            while got < n
                seg_dir = fullfile(this.root, this.name, ...
                                   sprintf('segment_%06d', this.segment));
                batches = StreamReader.list_batches_(seg_dir);
                advanced = false;
                for bi = 1:numel(batches)
                    b_start = batches(bi).start; b_n = batches(bi).n;
                    if b_start + b_n <= this.cursor
                        continue  % fully consumed
                    end
                    if got >= n
                        return
                    end
                    rows = this.decode_batch_(batches(bi).path, b_start, b_n);
                    first = this.cursor - b_start + 1;      % 1-based
                    take = min(b_n - (first - 1), n - got);
                    t = [t; rows(first:first + take - 1, :)]; %#ok<AGROW>
                    got = got + take;
                    this.cursor = this.cursor + take;
                    advanced = true;
                end
                % control markers decide whether to hop or stop
                % control sample_index is the LAST sample's index
                % (total - 1), matching transport/writer.py::stop
                if isfile(fullfile(seg_dir, 'eof.json'))
                    ctl = jsondecode(fileread(fullfile(seg_dir, 'eof.json')));
                    if this.cursor > double(ctl.sample_index)
                        this.finished = true;
                        return
                    end
                elseif isfile(fullfile(seg_dir, 'tombstone.json'))
                    ctl = jsondecode(fileread(fullfile(seg_dir, 'tombstone.json')));
                    if this.cursor > double(ctl.sample_index)
                        this.segment = double(ctl.next_segment);
                        continue
                    end
                end
                if ~advanced
                    return  % caught up; caller decides whether to block
                end
            end
        end

        function t = decode_batch_(this, path, b_start, b_n) %#ok<INUSD>
            sch = this.schema;
            if endsWith(path, '.bin')
                fid = fopen(path, 'r');
                raw = fread(fid, Inf, '*uint8');
                fclose(fid);
                if numel(raw) ~= b_n * sch.itemsize
                    error('river_spark:batch', 'batch %s: size mismatch', path);
                end
                rec = reshape(raw, sch.itemsize, b_n);   % one column per record
                t = sch.new_table(b_n);
                for fi = 1:numel(sch.names)
                    o = sch.offsets(fi); s = sch.sizes(fi);
                    col_bytes = rec(o + 1 : o + s, :);
                    mt = StreamSchema.matlab_type(sch.types{fi});
                    if strcmp(mt, 'cell')   % FIXED_WIDTH_BYTES
                        t.(sch.names{fi}) = num2cell(col_bytes', 2);
                    else
                        t.(sch.names{fi}) = typecast(col_bytes(:), mt);
                    end
                end
            else  % .npz: variable-width payloads
                [data, sizes] = StreamReader.read_npz_(path);
                if numel(sizes) ~= b_n
                    error('river_spark:batch', 'batch %s: count mismatch', path);
                end
                t = sch.new_table(b_n);
                off = 0;
                vals = cell(b_n, 1);
                for i = 1:b_n
                    vals{i} = data(off + 1 : off + sizes(i))';
                    off = off + sizes(i);
                end
                t.(sch.names{1}) = vals;
            end
        end
    end

    methods (Static, Access = private)
        function out = list_batch_paths_(seg_dir)
            d = [dir(fullfile(seg_dir, 'batch_*.bin')); ...
                 dir(fullfile(seg_dir, 'batch_*.npz'))];
            out = cell(1, numel(d));
            for i = 1:numel(d)
                out{i} = fullfile(seg_dir, d(i).name);
            end
        end

        function out = list_batches_(seg_dir)
            % struct array (.start .n .path), sorted by start index
            % (mirrors FileBackend.list_batches); one dir() pass so a
            % concurrent writer can never desync index from path.
            names = StreamReader.list_batch_paths_(seg_dir);
            out = struct('start', {}, 'n', {}, 'path', {});
            for i = 1:numel(names)
                [~, base] = fileparts(names{i});
                tok = regexp(base, ...
                    '^batch_(\d{12})_(\d+)_(\d+)_(\d+)$', 'tokens', 'once');
                if isempty(tok); continue; end
                out(end + 1) = struct('start', str2double(tok{1}), ...
                                      'n', str2double(tok{2}), ...
                                      'path', names{i}); %#ok<AGROW>
            end
            if ~isempty(out)
                [~, order] = sort([out.start]);
                out = out(order);
            end
        end

        function [data, sizes] = read_npz_(path)
            % Minimal npz reader: unzip, then parse the numpy v1.0 .npy
            % members "data" (|u1) and "sizes" (<i8).
            tmp = tempname;
            mkdir(tmp);
            cleanup = onCleanup(@() rmdir(tmp, 's'));
            files = unzip(path, tmp);
            data = []; sizes = [];
            for i = 1:numel(files)
                [~, member] = fileparts(files{i});
                arr = StreamReader.read_npy_(files{i});
                if strcmp(member, 'data')
                    data = uint8(arr);
                elseif strcmp(member, 'sizes')
                    sizes = int64(arr);
                end
            end
            if isempty(sizes) || (isempty(data) && any(sizes > 0))
                error('river_spark:npz', '%s: missing members', path);
            end
        end

        function arr = read_npy_(path)
            % numpy .npy v1.0: \x93NUMPY, ver(2), hlen(uint16 LE),
            % python-dict header, then raw little-endian data.
            fid = fopen(path, 'r');
            cleanup = onCleanup(@() fclose(fid));
            magic = fread(fid, 6, '*uint8')';
            if ~isequal(magic, [147 uint8('NUMPY')])
                error('river_spark:npy', '%s: bad magic', path);
            end
            ver = fread(fid, 2, '*uint8');
            if ver(1) ~= 1
                error('river_spark:npy', '%s: unsupported npy v%d', path, ver(1));
            end
            hlen = fread(fid, 1, 'uint16', 0, 'ieee-le');
            header = char(fread(fid, hlen, '*uint8')');
            descr = regexp(header, '''descr'':\s*''([^'']+)''', 'tokens', 'once');
            if ~isempty(regexp(header, '''fortran_order'':\s*True', 'once'))
                error('river_spark:npy', '%s: fortran order unsupported', path);
            end
            count = 1;
            shape = regexp(header, '''shape'':\s*\(([^)]*)\)', 'tokens', 'once');
            nums = regexp(shape{1}, '\d+', 'match');
            for i = 1:numel(nums)
                count = count * str2double(nums{i});
            end
            switch descr{1}
                case {'|u1', '<u1'}; arr = fread(fid, count, '*uint8');
                case '<i8';          arr = fread(fid, count, '*int64', 0, 'ieee-le');
                case '<i4';          arr = fread(fid, count, '*int32', 0, 'ieee-le');
                case '<f8';          arr = fread(fid, count, '*double', 0, 'ieee-le');
                otherwise
                    error('river_spark:npy', '%s: descr %s unsupported', path, descr{1});
            end
        end
    end
end
