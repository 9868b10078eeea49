/**
 * helix-tpu TypeScript client — fetch-based, zero-dependency.
 *
 * Same surface as the reference TS client (`sdks/typescript/src/index.ts`):
 * `new Client(url).query()` -> `.dynamic(request)` / `.stored(name)` ->
 * `.send()`, with the three engine-behavior header toggles.
 */

import { DynamicQueryRequest, JsonValue, stringifyJson } from "./dsl";

export * from "./dsl";

export class HelixError extends Error {
  constructor(
    message: string,
    readonly status?: number,
    readonly body?: unknown,
  ) {
    super(message);
  }
}

export interface ClientOptions {
  apiKey?: string;
  fetchImpl?: typeof fetch;
}

export class Client {
  private readonly url: string;
  private readonly apiKey?: string;
  private readonly fetchImpl: typeof fetch;

  constructor(url = "http://localhost:6969", options: ClientOptions = {}) {
    this.url = url.replace(/\/+$/, "");
    this.apiKey = options.apiKey;
    this.fetchImpl = options.fetchImpl ?? fetch;
  }

  query(): QueryBuilder {
    return new QueryBuilder(this.url, this.apiKey, this.fetchImpl);
  }

  async execute<R = unknown>(request: DynamicQueryRequest): Promise<R> {
    return this.query().dynamic(request).send<R>();
  }

  async call<R = unknown>(
    name: string,
    parameters: { [key: string]: JsonValue } = {},
  ): Promise<R> {
    return this.query().stored(name).body(parameters).send<R>();
  }

  async deployBundle<R = unknown>(bundle: JsonValue): Promise<R> {
    return post<R>(
      this.fetchImpl,
      `${this.url}/v1/bundle`,
      bundle,
      {},
      this.apiKey,
    );
  }

  async health<R = unknown>(): Promise<R> {
    const headers: { [key: string]: string } = {};
    if (this.apiKey) headers.Authorization = `Bearer ${this.apiKey}`;
    const response = await this.fetchImpl(`${this.url}/v1/health`, { headers });
    if (!response.ok) {
      throw new HelixError(`HTTP ${response.status}`, response.status);
    }
    return (await response.json()) as R;
  }
}

export class QueryBuilder {
  private headers: { [key: string]: string } = {
    "Content-Type": "application/json",
  };
  private route: string | null = null;
  private payload: JsonValue | null = null;

  constructor(
    private readonly url: string,
    private readonly apiKey: string | undefined,
    private readonly fetchImpl: typeof fetch,
  ) {}

  writerOnly(): this {
    this.headers["x-helix-require-writer"] = "true";
    return this;
  }
  warmOnly(): this {
    this.headers["x-helix-warm"] = "true";
    return this;
  }
  shouldAwaitDurability(should: boolean): this {
    this.headers["x-helix-await-durable"] = should ? "true" : "false";
    return this;
  }
  body(data: JsonValue): this {
    this.payload = data;
    return this;
  }
  dynamic(request: DynamicQueryRequest | JsonValue): this {
    this.route = "/v1/query";
    this.payload =
      request instanceof DynamicQueryRequest ? request.encode() : request;
    return this;
  }
  stored(name: string): this {
    this.route = `/v1/query/${name}`;
    return this;
  }

  async send<R = unknown>(): Promise<R> {
    if (this.route === null) {
      throw new HelixError("choose dynamic() or stored() before send()");
    }
    return post<R>(
      this.fetchImpl,
      `${this.url}${this.route}`,
      this.payload ?? {},
      this.headers,
      this.apiKey,
    );
  }
}

async function post<R>(
  fetchImpl: typeof fetch,
  url: string,
  body: JsonValue,
  headers: { [key: string]: string },
  apiKey?: string,
): Promise<R> {
  const allHeaders = { "Content-Type": "application/json", ...headers };
  if (apiKey) allHeaders.Authorization = `Bearer ${apiKey}`;
  const response = await fetchImpl(url, {
    method: "POST",
    headers: allHeaders,
    body: stringifyJson(body),
  });
  if (!response.ok) {
    let payload: unknown;
    try {
      payload = await response.json();
    } catch {
      payload = undefined;
    }
    const message =
      payload && typeof payload === "object" && "error" in payload
        ? String(
            (payload as { error: { message?: string } }).error.message ??
              `HTTP ${response.status}`,
          )
        : `HTTP ${response.status}`;
    throw new HelixError(message, response.status, payload);
  }
  return (await response.json()) as R;
}
