classdef StreamWriter < handle
    % StreamWriter: pure-M writer for the river_spark FILE backend
    % (fixed-width schemas; variable-width writing stays on the Python /
    % Spark side, reference parity note in matlab/README.md).
    %
    % API parity with the reference MATLAB binding (initialize /
    % write_table / stop / metadata set at initialize): produces exactly
    % the layout river_spark's Python reader, Spark DataSource, and
    % ingester consume — metadata.json, packed .bin batches with
    % monotone (ms, seq) keys in the filename, and a final eof.json.
    %
    % Usage:
    %   w = StreamWriter('/path/to/log_root');
    %   w.initialize('my_stream', schema_json);       % or with metadata
    %   w.write_table(t);
    %   w.stop();

    properties (SetAccess = private)
        root
        name
        schema          % StreamSchema
        sample_index    % next global sample index
        batch_counter   % per-process seq base
        segment
    end

    methods
        function this = StreamWriter(log_root)
            this.root = log_root;
        end

        function initialize(this, stream_name, schema_json, user_metadata)
            if nargin < 4; user_metadata = struct(); end
            this.name = stream_name;
            this.schema = StreamSchema(schema_json);
            if this.schema.is_variable_width()
                error('river_spark:writer', ...
                      'variable-width writing is Python/Spark-side only');
            end
            this.sample_index = 0;
            this.batch_counter = 0;
            this.segment = 0;
            sdir = fullfile(this.root, stream_name, 'segment_000000');
            if isfile(fullfile(this.root, stream_name, 'metadata.json'))
                error('river_spark:exists', 'stream %s already exists', stream_name);
            end
            mkdir(sdir);
            meta = struct( ...
                'first_segment', 0, ...
                'schema', schema_json, ...
                'initialized_at_us', int64(round(posixtime(datetime('now', 'TimeZone', 'UTC')) * 1e6)), ...
                'user_metadata', user_metadata, ...
                'entries_per_segment', 16777216);
            StreamWriter.write_json_atomic_( ...
                fullfile(this.root, stream_name, 'metadata.json'), meta);
        end

        function write_table(this, t)
            % Pack one batch of samples (rows of a MATLAB table matching
            % the schema) into a single .bin batch file.
            sch = this.schema;
            n = height(t);
            if n == 0; return; end
            rec = zeros(sch.itemsize, n, 'uint8');
            for fi = 1:numel(sch.names)
                o = sch.offsets(fi); s = sch.sizes(fi);
                mt = StreamSchema.matlab_type(sch.types{fi});
                col = t.(sch.names{fi});
                if strcmp(mt, 'cell')   % FIXED_WIDTH_BYTES
                    for ri = 1:n
                        v = uint8(col{ri});
                        if numel(v) ~= s
                            error('river_spark:writer', 'fixed-width size mismatch');
                        end
                        rec(o + 1 : o + s, ri) = v(:);
                    end
                else
                    cast_col = cast(col, mt);
                    bytes = typecast(cast_col(:), 'uint8');
                    rec(o + 1 : o + s, :) = reshape(bytes, s, n);
                end
            end
            key_ms = round(posixtime(datetime('now', 'TimeZone', 'UTC')) * 1e3);
            stem = sprintf('batch_%012d_%d_%d_%d', ...
                           this.sample_index, n, key_ms, this.batch_counter);
            seg_dir = fullfile(this.root, this.name, ...
                               sprintf('segment_%06d', this.segment));
            tmp = fullfile(seg_dir, [stem '.bin.tmp']);
            fid = fopen(tmp, 'w');
            fwrite(fid, rec(:), 'uint8');
            fclose(fid);
            movefile(tmp, fullfile(seg_dir, [stem '.bin']));
            this.sample_index = this.sample_index + n;
            this.batch_counter = this.batch_counter + n;
        end

        function stop(this)
            seg_dir = fullfile(this.root, this.name, ...
                               sprintf('segment_%06d', this.segment));
            % sample_index is the LAST sample's index (total - 1),
            % matching transport/writer.py::stop
            StreamWriter.write_json_atomic_( ...
                fullfile(seg_dir, 'eof.json'), ...
                struct('eof', 1, 'sample_index', this.sample_index - 1));
        end
    end

    methods (Static, Access = private)
        function write_json_atomic_(path, obj)
            tmp = [path '.tmp'];
            fid = fopen(tmp, 'w');
            fwrite(fid, jsonencode(obj), 'char');
            fclose(fid);
            movefile(tmp, path);
        end
    end
end
